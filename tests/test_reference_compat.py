"""Drop-in compatibility: the REFERENCE's own test suite must pass against
this package, verbatim, via a module alias (`import pydynet` ->
pydynet_tpu).  Skipped when the reference checkout isn't mounted."""
import os
import subprocess
import sys
import tempfile
import textwrap

import pytest

REF_TESTS = "/root/reference/tests"


@pytest.mark.skipif(not os.path.isdir(REF_TESTS),
                    reason="reference checkout not available")
def test_reference_test_suite_passes_against_us():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.TemporaryDirectory() as tmp:
        with open(os.path.join(tmp, "conftest.py"), "w") as f:
            f.write(textwrap.dedent(f"""
                import os, sys
                os.environ["JAX_PLATFORMS"] = "cpu"
                import jax
                jax.config.update("jax_platforms", "cpu")
                sys.path.insert(0, {repo!r})
                import pydynet_tpu
                sys.modules["pydynet"] = pydynet_tpu
                sys.modules["pydynet.core"] = pydynet_tpu.core
                sys.modules["pydynet.nn"] = pydynet_tpu.nn
                sys.modules["pydynet.cuda"] = pydynet_tpu.cuda
            """))
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", REF_TESTS, "-q",
             "-p", "no:cacheprovider"],
            cwd=tmp, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-2000:]
    assert "passed" in proc.stdout
