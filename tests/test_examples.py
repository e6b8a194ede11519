"""The example scripts (the reference notebooks' script forms,
SURVEY.md component #20) must at least parse, import their deps, and
expose their argparse surface — catches bit-rot when library APIs they
call are refactored."""
import os
import subprocess
import sys

import pytest

EXAMPLES = ["train_gsr.py", "train_template.py", "unet_transformer.py",
            "three_fold_vis.py"]


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_help(name):
    path = os.path.join(os.path.dirname(__file__), "..", "examples", name)
    proc = subprocess.run([sys.executable, path, "--help"],
                          capture_output=True, text=True, timeout=120,
                          env=dict(os.environ, JAX_PLATFORMS="cpu"))
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "usage" in proc.stdout.lower()
