"""Regenerate the golden trajectory CSVs (CPU, float64, default engine path).

Run from the repo root:  python tests/goldens/generate.py [config ...]

Only regenerate when a physics change is INTENDED; the diff then documents
exactly what moved.  tests/test_goldens.py locks the current files.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from golden_configs import CONFIGS, run_config, write_golden  # noqa: E402


def main(names):
    for name in names:
        print(f"[goldens] {name} ...", flush=True)
        for env_id, record in run_config(name).items():
            write_golden(env_id, record)
            print(f"  wrote {env_id}.csv  shape={record['data'].shape}")


if __name__ == "__main__":
    main(sys.argv[1:] or list(CONFIGS))
