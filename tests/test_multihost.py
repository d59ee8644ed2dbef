"""Multi-process jax.distributed test (SURVEY §4 testing prescription,
VERDICT r1 item 8): 2 processes x 4 virtual CPU devices drive one
sharded LM step through multihost.initialize / global_mesh /
local_batch_slice, and both processes agree with a single-process
reference run."""

import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(600)
def test_two_process_sharded_step(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = repo + ":" + env.get("PYTHONPATH", "")
    worker = os.path.join(repo, "tests", "multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(i), "2"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    import re
    parsed = {}
    for out in outs:
        m = re.search(r"MULTIHOST_OK (\d+) (\[.*?\]) (\[.*?\])", out)
        assert m, out
        parsed[int(m.group(1))] = (eval(m.group(2)), eval(m.group(3)))

    # both processes saw the same global result
    assert parsed[0][1] == parsed[1][1]
    # each host's local slice is its rows of the global batch
    full = parsed[0][1]
    assert parsed[0][0] == full[:2]
    assert parsed[1][0] == full[2:]

    # and the distributed result matches a single-process reference
    import jax.numpy as jnp
    from moshi_tpu.models.lm import (LMConfig, init_gen_state,
                                     init_lm_params, lm_gen_step)
    cfg = LMConfig(
        dim=64, num_heads=8, num_layers=2, hidden_dim=128, context=16,
        card=32, n_q=4, dep_q=2, text_card=48, delays=(0, 0, 1, 1, 2),
        depformer_dim=32, depformer_heads=4, depformer_layers=2,
        depformer_hidden=64, depformer_low_rank=16)
    params = init_lm_params(jax.random.PRNGKey(0), cfg)
    state = init_gen_state(cfg, 4, jax.random.PRNGKey(3))
    other = jnp.zeros((4, cfg.n_q - cfg.dep_q), jnp.int32)
    out = None
    for _ in range(3):
        out, state = lm_gen_step(cfg, params, state, other_audio=other,
                                 temp=0.0, temp_text=0.0)
    ref = list(np.asarray(out["sampled_text"]).reshape(-1))
    assert full == ref
