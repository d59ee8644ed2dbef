"""Worker process for the multi-process jax.distributed test (run by
tests/test_multihost.py, 2 processes x 4 virtual CPU devices each).

Drives one sharded LM generation step through the real multihost flow:
multihost.initialize -> global_mesh -> device_put global arrays ->
jitted step over the (data, model) mesh -> per-host batch slice readout.
Prints MULTIHOST_OK <text tokens> on success; the orchestrator compares
both processes' outputs to a single-process reference.
"""

import os
import sys


def main():
    port = sys.argv[1]
    pid = int(sys.argv[2])
    nproc = int(sys.argv[3])
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    from moshi_tpu.parallel import multihost

    multihost.initialize(coordinator=f"localhost:{port}",
                         num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == nproc * 4, len(jax.devices())

    from moshi_tpu.models.lm import LMConfig, init_gen_state, lm_gen_step
    from moshi_tpu.parallel import lm_param_pspecs, lm_state_pspecs, shard_tree

    cfg = LMConfig(
        dim=64, num_heads=8, num_layers=2, hidden_dim=128, context=16,
        card=32, n_q=4, dep_q=2, text_card=48, delays=(0, 0, 1, 1, 2),
        depformer_dim=32, depformer_heads=4, depformer_layers=2,
        depformer_hidden=64, depformer_low_rank=16)
    mesh = multihost.global_mesh(model=4)          # data=2 spans processes
    assert mesh.shape == {"data": 2, "model": 4}

    from moshi_tpu.models.lm import init_lm_params
    params = init_lm_params(jax.random.PRNGKey(0), cfg)
    batch = 4
    state = init_gen_state(cfg, batch, jax.random.PRNGKey(3))
    params_s = shard_tree(params, lm_param_pspecs(params), mesh)
    state_s = shard_tree(state, lm_state_pspecs(state), mesh)
    other = jnp.zeros((batch, cfg.n_q - cfg.dep_q), jnp.int32)

    with mesh:
        step = jax.jit(lambda p, s, o: lm_gen_step(
            cfg, p, s, other_audio=o, temp=0.0, temp_text=0.0))
        out = None
        for _ in range(3):
            out, state_s = step(params_s, state_s, other)
        jax.block_until_ready(out["sampled_text"])

    # each host reads back its addressable slice of the session batch
    sl = multihost.local_batch_slice(batch)
    assert sl == slice(pid * 2, pid * 2 + 2), sl
    # dedupe addressable shards: the data rows are replicated over the
    # 4 local model-axis devices
    seen = {}
    for s in out["sampled_text"].addressable_shards:
        seen[str(s.index)] = np.asarray(s.data).reshape(-1)
    local_tokens = np.concatenate([seen[k] for k in sorted(seen)])
    # gather the full (replicated-readable) result for comparison
    full = np.asarray(jax.experimental.multihost_utils
                      .process_allgather(out["sampled_text"], tiled=True))
    print("MULTIHOST_OK", pid, list(local_tokens), list(full.reshape(-1)),
          flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
