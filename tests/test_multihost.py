"""Multi-host (2-process) training over a process-spanning mesh.

Two jax.distributed CPU processes (4 virtual devices each) train one step on
the 8-device dp mesh and must produce exactly the loss of the single-process
8-device run. SURVEY §5 distributed-backend row; the reference has no
multi-host story (its only mechanism is batch_sample_diffusion.sh process
forking)."""

import os
import re
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run(pid, port, mode="train", timeout=420):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    return subprocess.Popen(
        [sys.executable, WORKER, str(pid), str(port), mode],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


def _loss(out: str) -> float:
    m = re.search(r"LOSS=([-\d.]+)", out)
    assert m, f"no LOSS in output:\n{out[-2000:]}"
    return float(m.group(1))


def test_two_process_train_step_matches_single_process():
    port = _free_port()
    p0 = _run(0, port)
    p1 = _run(1, port)
    out0, _ = p0.communicate(timeout=420)
    out1, _ = p1.communicate(timeout=60)
    assert p0.returncode == 0, out0[-2000:]
    assert p1.returncode == 0, out1[-2000:]

    ref = _run(-1, port)
    outr, _ = ref.communicate(timeout=420)
    assert ref.returncode == 0, outr[-2000:]

    l0, l1, lr = _loss(out0), _loss(out1), _loss(outr)
    assert l0 == pytest.approx(l1, abs=1e-9)
    assert l0 == pytest.approx(lr, rel=1e-5)

    def _val(out):
        m = re.search(r"VAL=([-\d.]+)", out)
        assert m, f"no VAL in output:\n{out[-2000:]}"
        return float(m.group(1))

    v0, v1, vr = _val(out0), _val(out1), _val(outr)
    assert v0 == pytest.approx(v1, abs=1e-9)
    assert v0 == pytest.approx(vr, rel=1e-5)


def _field(out: str, name: str) -> str:
    m = re.search(rf"{name}=(\S+)", out)
    assert m, f"no {name} in output:\n{out[-2000:]}"
    return m.group(1)


def test_two_process_sampling_matches_single_process():
    """The production sharded sampler (sample_testset_sharded, the function
    behind `cli/sample_diffusion --all --sharded`) over a 2-process mesh
    must return the IDENTICAL molecules on every process, equal to the
    single-process 8-device run — the last untested scope of the
    batch_sample_diffusion.sh replacement (VERDICT r4 #7; reference:
    scripts/batch_sample_diffusion.sh:15-21)."""
    port = _free_port()
    p0 = _run(0, port, "sample")
    p1 = _run(1, port, "sample")
    out0, _ = p0.communicate(timeout=420)
    out1, _ = p1.communicate(timeout=60)
    assert p0.returncode == 0, out0[-2000:]
    assert p1.returncode == 0, out1[-2000:]

    ref = _run(-1, port, "sample")
    outr, _ = ref.communicate(timeout=420)
    assert ref.returncode == 0, outr[-2000:]

    # both processes see the bitwise-identical gathered result
    assert _field(out0, "POSDIGEST") == _field(out1, "POSDIGEST")
    assert _field(out0, "V") == _field(out1, "V")
    # and it matches the single-process run (same program, numerically tight)
    assert _field(out0, "V") == _field(outr, "V")
    assert float(_field(out0, "POS")) == pytest.approx(
        float(_field(outr, "POS")), rel=1e-5
    )
