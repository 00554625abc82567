"""Top-level package exports (reference root exports
`sgmcmc_ssm/__init__.py:1-2` plus per-model sampler classes)."""
import sgmcmc_tpu


def test_root_exports_resolve():
    for name in sgmcmc_tpu.__all__:
        assert getattr(sgmcmc_tpu, name) is not None


def test_root_exports_are_the_real_classes():
    from sgmcmc_tpu.evaluation.evaluator import SamplerEvaluator
    from sgmcmc_tpu.inference.samplers import SVMSampler
    assert sgmcmc_tpu.SVMSampler is SVMSampler
    assert sgmcmc_tpu.SamplerEvaluator is SamplerEvaluator
    assert sgmcmc_tpu.get_model("svm").name == "svm"


def test_dir_lists_exports():
    assert "LGSSMSampler" in dir(sgmcmc_tpu)
