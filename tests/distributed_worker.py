"""Worker for the REAL 2-process distributed test (tests/test_distributed.py).

Each spawned process owns 4 virtual CPU devices and joins an 8-device global
runtime via ``maybe_init_distributed`` (gloo CPU collectives).  Process 0
also computes the single-device reference step so the dp+tp result over the
process-spanning mesh is checked against it *in-worker*.

Reference analogue: none — the reference is strictly single-GPU (SURVEY.md
§2); this exercises the build's own multi-host path (parallel/mesh.py).
"""

import os
import sys

import numpy as np


def main() -> None:
    import jax

    # sitecustomize force-registers the axon TPU plugin; config (not env)
    # is the only working override on this machine (CLAUDE.md).
    jax.config.update("jax_platforms", "cpu")

    from cp360_tpu.parallel.mesh import (
        clstm_param_sharding,
        device_put_global,
        make_mesh,
        maybe_init_distributed,
        replicated,
        shard_batch,
        shard_batch_per_host,
    )

    assert maybe_init_distributed() is True
    pid = jax.process_index()
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())
    assert jax.local_device_count() == 4, jax.local_device_count()

    import jax.numpy as jnp  # noqa: F401  (backend is now initialized)
    import optax

    from cp360_tpu.config import Config
    from cp360_tpu.models.clstm import init_clstm_params
    from cp360_tpu.train.loop import make_train_step

    chans = 16
    cfg = Config(input_size=chans, hidden_size=chans, flow_h=16, lr=1e-3,
                 compute_dtype="float32")
    # identical on both processes (same seed)
    params_host = jax.device_get(
        init_clstm_params(jax.random.PRNGKey(0), chans, chans))
    opt = optax.sgd(cfg.lr)  # linear in the gradient -> exactness checks hold
    step = make_train_step(cfg, opt)

    rng = np.random.RandomState(1)
    seq = rng.rand(8, 5, 6, 7, 7, chans).astype(np.float32)
    flows = rng.randn(8, 5, 16, 32, 2).astype(np.float32)

    # --- global dp+tp step over the 2-process mesh ----------------------
    mesh = make_mesh(n_data=4, n_model=2)
    p_sh = device_put_global(params_host,
                             clstm_param_sharding(mesh, params_host))
    o_sh = opt.init(p_sh)
    # production contract: every process passes the IDENTICAL global batch
    # and shard_batch keeps only this host's rows
    batch = shard_batch(mesh, {"seq": seq, "flows": flows})
    assert batch["seq"].shape == (8, 5, 6, 7, 7, chans), batch["seq"].shape
    # per-host feeding path: each process passes ONLY its 4 rows — must
    # assemble the identical global array
    batch2 = shard_batch_per_host(
        mesh, {"seq": seq[pid * 4:(pid + 1) * 4],
               "flows": flows[pid * 4:(pid + 1) * 4]})
    assert float(jnp.abs(batch["seq"] - batch2["seq"]).max()) == 0.0
    assert float(jnp.abs(batch["flows"] - batch2["flows"]).max()) == 0.0

    p2, _, m2 = step(p_sh, o_sh, batch["seq"], batch["flows"])
    dist_metrics = {k: float(m2[k])
                    for k in ("loss", "smooth", "temporal", "mask")}

    # gather the updated (model-sharded) weights for comparison
    from jax.experimental import multihost_utils

    p2_host = multihost_utils.process_allgather(p2, tiled=True)

    # --- single-device reference, computed locally by each worker -------
    dev0 = jax.local_devices()[0]
    p1 = jax.device_put(params_host, dev0)
    p1, _, m1 = step(p1, opt.init(p1),
                     jax.device_put(seq, dev0), jax.device_put(flows, dev0))

    for k, v in dist_metrics.items():
        ref = float(m1[k])
        assert abs(v - ref) <= 1e-5 * max(1.0, abs(ref)), (k, v, ref)
    for leaf in ("conv1", "conv2", "gates"):
        g1 = (np.asarray(params_host[leaf]["w"])
              - np.asarray(jax.device_get(p1)[leaf]["w"])).ravel()
        g2 = (np.asarray(params_host[leaf]["w"])
              - np.asarray(p2_host[leaf]["w"])).ravel()
        cos = g1 @ g2 / (np.linalg.norm(g1) * np.linalg.norm(g2))
        assert cos > 0.999, (leaf, cos)

    # replicated() sanity: a global scalar both processes can read
    ones = device_put_global(np.ones(()), replicated(mesh))
    assert float(ones) == 1.0

    print(f"DIST_OK pid={pid} loss={dist_metrics['loss']:.6f}", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
