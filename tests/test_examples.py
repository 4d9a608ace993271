"""Examples 02-05 execute end to end (tiny step budgets).

The reference's notebooks are its de-facto integration tests (SURVEY.md §4);
examples/01..05 are their parity surface here. 01 already runs inside the
venv packaging test (test_packaging.py); these smoke-run the rest as
subprocesses with ``DEEPSVG_EXAMPLE_STEPS`` shrunk so each finishes in CI
time while still exercising its full pipeline (train loop, sampling,
rendering, GIF/grid writing).
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EXAMPLES = [
    "02_svgtensor_optimization.py",
    "03_train_and_interpolate.py",
    "04_fonts_generation.py",
    "05_animation_project.py",
]


@pytest.mark.parametrize("example", EXAMPLES)
def test_example_runs(example, tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["DEEPSVG_EXAMPLE_STEPS"] = "3"
    env["PYTHONPATH"] = f"{REPO}:" + env.get("PYTHONPATH", "")
    runner = tmp_path / "run.py"
    # sitecustomize-resistant CPU forcing (see conftest.py): the env var alone
    # does not survive the ambient remote-TPU plugin registration
    runner.write_text(
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import runpy\n"
        f"runpy.run_path({os.path.join(REPO, 'examples', example)!r},"
        " run_name='__main__')\n"
    )
    r = subprocess.run(
        [sys.executable, str(runner)], env=env, capture_output=True,
        text=True, timeout=900, cwd=str(tmp_path),
    )
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-2500:])
