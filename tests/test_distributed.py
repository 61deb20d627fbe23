"""Multi-PROCESS runtime (VERDICT r2 #5): two jax.distributed CPU
processes form the (dp=2, tp=4) host mesh — dp over processes (the DCN
axis on real pods), tp inside each — and run one train step plus one
GSPMD tensor-parallel serve forward through cross-process collectives.
The reference's only multi-host hook is HF Trainer torch.distributed
(reference: finetune/train.py:286-290,653-655)."""

import os
import re
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_train_and_serve():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count (4)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep))
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert "DIST_OK" in out, out[-2000:]

    # both processes must see the SAME replicated loss and logits (the
    # collectives crossed processes; divergence = broken dp/tp plumbing)
    vals = [re.search(r"DIST_OK pid=\d loss=([\d.]+) lsum=(-?[\d.]+) "
                      r"devices=(\d+)", o) for o in outs]
    assert all(vals), outs
    assert vals[0].group(1) == vals[1].group(1)
    assert vals[0].group(2) == vals[1].group(2)
    assert vals[0].group(3) == "8"
