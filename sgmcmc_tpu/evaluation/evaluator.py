"""Evaluators: tidy-DataFrame metric collection around samplers.

Rewrite of `/root/reference/sgmcmc_ssm/evaluator.py`:

* `BaseEvaluator` (`evaluator.py:8-182`)   — metric/sample rows -> DataFrames
* `SamplerEvaluator` (`evaluator.py:187-377`) — online wrapper timing each
  sampler step, state save/load for resume
* `OfflineEvaluator` (`evaluator.py:382-632`) — re-evaluates a saved
  parameter trace with recursive-bisection ordering
* `average_parameters_list` / `half_average_parameters_list`
  (`evaluator.py:683-759`) — running means in flattened-vector space
"""
from __future__ import annotations

import time
from typing import Iterable

import numpy as np
import pandas as pd

import jax
from jax.flatten_util import ravel_pytree


def _as_rows(result) -> list[dict]:
    if isinstance(result, dict):
        return [result]
    return list(result)


class BaseEvaluator:
    """Collects metric/sample rows into tidy DataFrames.

    Rows are buffered in plain lists and materialized into a DataFrame only
    when read — O(n) over a run instead of the per-evaluation
    ``pd.concat`` O(n^2) of the reference (`evaluator.py:102-142`).
    """

    def __init__(self, metric_functions=None, sample_functions=None):
        self.metric_functions = list(metric_functions or [])
        self.sample_functions = list(sample_functions or [])
        self._metrics_df = pd.DataFrame()
        self._metric_rows: list[dict] = []
        self._samples_df = pd.DataFrame()
        self._sample_rows: list[dict] = []

    @property
    def metrics(self) -> pd.DataFrame:
        if self._metric_rows:
            self._metrics_df = pd.concat(
                [self._metrics_df, pd.DataFrame(self._metric_rows)],
                ignore_index=True)
            self._metric_rows = []
        return self._metrics_df

    @metrics.setter
    def metrics(self, df: pd.DataFrame):
        self._metrics_df = df
        self._metric_rows = []

    @property
    def samples(self) -> pd.DataFrame:
        if self._sample_rows:
            self._samples_df = pd.concat(
                [self._samples_df, pd.DataFrame(self._sample_rows)],
                ignore_index=True)
            self._sample_rows = []
        return self._samples_df

    @samples.setter
    def samples(self, df: pd.DataFrame):
        self._samples_df = df
        self._sample_rows = []

    def eval_metric_functions(self, sampler, iteration, **extra):
        rows = []
        for fn in self.metric_functions:
            for row in _as_rows(fn(sampler)):
                rows.append(dict(iteration=iteration, **row, **extra))
        self._metric_rows.extend(rows)
        return rows

    def eval_sample_functions(self, sampler, iteration, **extra):
        rows = []
        for fn in self.sample_functions:
            for row in _as_rows(fn(sampler)):
                rows.append(dict(iteration=iteration, **row, **extra))
        self._sample_rows.extend(rows)
        return rows

    def get_metrics(self) -> pd.DataFrame:
        return self.metrics

    def get_samples(self) -> pd.DataFrame:
        return self.samples


class SamplerEvaluator(BaseEvaluator):
    """Online evaluator: wraps sampler steps, timing and recording
    (`SamplerEvaluator.evaluate_sampler_step`, `evaluator.py:295-365`)."""

    def __init__(self, sampler, metric_functions=None, sample_functions=None,
                 init_state=None):
        super().__init__(metric_functions, sample_functions)
        self.sampler = sampler
        self.iteration = 0
        self.elapsed_time = 0.0
        if init_state is not None:
            self.load_state(init_state)
        else:
            self.eval_metric_functions(sampler, self.iteration)
            self.eval_sample_functions(sampler, self.iteration)

    def evaluate_sampler_step(self, func_names: list[str],
                              func_kwargs: list[dict] | None = None,
                              evaluate: bool = True):
        """Call the named sampler methods, time them, record metrics."""
        if isinstance(func_names, str):
            func_names = [func_names]
        if func_kwargs is None:
            func_kwargs = [{} for _ in func_names]
        start = time.perf_counter()
        out = None
        for name, kwargs in zip(func_names, func_kwargs):
            out = getattr(self.sampler, name)(**kwargs)
        step_time = time.perf_counter() - start
        self.iteration += 1
        self.elapsed_time += step_time
        if evaluate:
            self.eval_metric_functions(self.sampler, self.iteration,
                                       time=self.elapsed_time)
            self._metric_rows.append(dict(
                iteration=self.iteration, metric="runtime", variable="all",
                value=step_time, time=self.elapsed_time))
            self.eval_sample_functions(self.sampler, self.iteration,
                                       time=self.elapsed_time)
        return out

    def save_state(self) -> dict:
        return dict(
            iteration=self.iteration,
            elapsed_time=self.elapsed_time,
            metrics=self.metrics,
            samples=self.samples,
            parameters=self.sampler.parameters,
        )

    def load_state(self, state: dict):
        self.iteration = state["iteration"]
        self.elapsed_time = state["elapsed_time"]
        self.metrics = state["metrics"]
        self.samples = state["samples"]
        self.sampler.parameters = state["parameters"]


class OfflineEvaluator(BaseEvaluator):
    """Evaluate a saved parameter trace out of order
    (`OfflineEvaluator`, `evaluator.py:382-632`): first, last, then always
    the midpoint of the largest unevaluated gap."""

    def __init__(self, sampler, parameters_list: list,
                 parameters_times: Iterable | None = None,
                 metric_functions=None, sample_functions=None,
                 init_state=None):
        super().__init__(metric_functions, sample_functions)
        self.sampler = sampler
        self.parameters_list = list(parameters_list)
        self.parameters_times = (list(parameters_times)
                                 if parameters_times is not None else None)
        self.eval_flag = np.zeros(len(self.parameters_list), dtype=bool)
        if init_state is not None:
            self.metrics = init_state["metrics"]
            self.samples = init_state["samples"]
            self.eval_flag = init_state["eval_flag"]

    def num_to_eval(self) -> int:
        return int((~self.eval_flag).sum())

    def _next_eval_index(self) -> int | None:
        """Recursive bisection order (`_get_eval_iteration`,
        `evaluator.py:635-661`)."""
        n = len(self.eval_flag)
        if n == 0 or self.eval_flag.all():
            return None
        if not self.eval_flag[0]:
            return 0
        if not self.eval_flag[-1]:
            return n - 1
        done = np.flatnonzero(self.eval_flag)
        gaps = np.diff(done)
        i = int(np.argmax(gaps))
        if gaps[i] <= 1:
            return None
        return int(done[i] + gaps[i] // 2)

    def evaluate(self, num_to_eval: int | None = None, tqdm=None,
                 iter_func_name: str | list[str] | None = None,
                 iter_func_kwargs: dict | list[dict] | None = None):
        """Evaluate trace points in bisection order.

        ``iter_func_name`` / ``iter_func_kwargs`` mirror the reference's
        per-iteration sampler hook (`OfflineEvaluator.evaluate`,
        `evaluator.py:524-620`): after loading each trace point's
        parameters and BEFORE the metric functions run, call the named
        sampler method(s) — e.g. ``"project_parameters"``, or a Gibbs
        refinement step.  A string names one method; a list names several,
        with ``iter_func_kwargs`` a matching list of kwarg dicts.
        """
        if iter_func_name is None:
            iter_calls = []
        elif isinstance(iter_func_name, str):
            if iter_func_kwargs is not None and not isinstance(
                    iter_func_kwargs, dict):
                raise TypeError("iter_func_kwargs must be a dict when "
                                "iter_func_name is a string")
            iter_calls = [(iter_func_name, iter_func_kwargs or {})]
        elif isinstance(iter_func_name, list):
            if iter_func_kwargs is None:
                iter_func_kwargs = [{} for _ in iter_func_name]
            if (not isinstance(iter_func_kwargs, list)
                    or len(iter_func_kwargs) != len(iter_func_name)):
                raise ValueError("iter_func_kwargs must be a list of dicts "
                                 "matching iter_func_name")
            iter_calls = list(zip(iter_func_name, iter_func_kwargs))
        else:
            raise TypeError("Invalid iter_func_name")
        for name, _ in iter_calls:
            if not callable(getattr(self.sampler, name, None)):
                raise ValueError(
                    f"iter_func_name '{name}' is not a sampler method")

        count = 0
        it = range(num_to_eval) if num_to_eval else iter(int, 1)
        if tqdm is not None and num_to_eval:
            it = tqdm(it)
        for _ in it:
            idx = self._next_eval_index()
            if idx is None:
                break
            self.sampler.parameters = self.parameters_list[idx]
            for name, kwargs in iter_calls:
                getattr(self.sampler, name)(**kwargs)
            extra = {}
            if self.parameters_times is not None:
                extra["time"] = self.parameters_times[idx]
            self.eval_metric_functions(self.sampler, idx, **extra)
            self.eval_sample_functions(self.sampler, idx, **extra)
            self.eval_flag[idx] = True
            count += 1
        return count

    def save_state(self) -> dict:
        return dict(metrics=self.metrics, samples=self.samples,
                    eval_flag=self.eval_flag)


def average_parameters_list(parameters_list: list, burnin: int = 0) -> list:
    """Running mean of the trace in flattened-vector space
    (`average_parameters_list`, `evaluator.py:683-722`)."""
    if not parameters_list:
        return []
    flat0, unravel = ravel_pytree(parameters_list[0])
    out = []
    acc = np.zeros_like(np.asarray(flat0))
    count = 0
    for i, p in enumerate(parameters_list):
        if i < burnin:
            out.append(p)
            continue
        acc = acc + np.asarray(ravel_pytree(p)[0])
        count += 1
        out.append(unravel(acc / count))
    return out


def half_average_parameters_list(parameters_list: list) -> list:
    """Mean of the most recent half of the trace at each index
    (`half_average_parameters_list`, `evaluator.py:724-759`)."""
    if not parameters_list:
        return []
    flat0, unravel = ravel_pytree(parameters_list[0])
    flats = np.stack([np.asarray(ravel_pytree(p)[0])
                      for p in parameters_list])
    cumsum = np.concatenate([np.zeros((1, flats.shape[1])),
                             np.cumsum(flats, axis=0)])
    out = []
    for i in range(len(parameters_list)):
        lo = (i + 1) // 2  # average over indices [lo, i]
        mean = (cumsum[i + 1] - cumsum[lo]) / (i + 1 - lo)
        out.append(unravel(mean))
    return out
