"""EUR/GBP exchange-rate SVM demo — the GBP variant entry point.

Parity with `/root/reference/demo/exchange_rate/exchange_rate_demo_gbp.py`:
identical workflow to the EUR/US demo but reading
`data/EURGBP_processed.npz` (produce it from a raw Finam CSV with
`process_exchange_data.py EURGBP_data.csv data/EURGBP_processed.npz`).

Note: the reference snapshot ships only the processed EUR/US npz — the raw
EURGBP CSV is listed in its `.MISSING_LARGE_BLOBS` — so this entry point
cannot be exercised on real GBP data here; it delegates to the generic demo
with the GBP data path and is covered by the same code paths RESULTS.md
records for EUR/US.

Usage: python exchange_rate_demo_gbp.py [--data PATH.npz] [other demo args]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

DEFAULT_GBP_DATA = os.path.join(os.path.dirname(__file__), "data",
                                "EURGBP_processed.npz")

if __name__ == "__main__":
    if "--data" not in sys.argv:
        sys.argv += ["--data", DEFAULT_GBP_DATA]
    if not os.path.exists(sys.argv[sys.argv.index("--data") + 1]):
        sys.exit("EURGBP npz not found — run process_exchange_data.py on a "
                 "raw EURGBP CSV first (the reference snapshot does not "
                 "include it; see .MISSING_LARGE_BLOBS).")
    from exchange_rate_demo import main
    main()
