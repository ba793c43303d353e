"""Learning-dynamics sanity: the weak-supervision objective actually trains.

Mechanical step tests live in test_pipeline; this checks that repeated steps
on consistent synthetic data reduce the (weighted) objective — catching
sign/stop-gradient/optimizer wiring mistakes that shape tests cannot.
"""

import numpy as np
import jax
import jax.numpy as jnp

from cp360_tpu.config import Config
from cp360_tpu.models.clstm import init_clstm_params
from cp360_tpu.train.loop import make_optimizer, make_train_step

C = 8


def _synthetic_batch(rng, b=4):
    # CAM cubes with a consistent bright region + mild noise, and flows that
    # are mostly static (so the motion-mask/temporal terms are informative).
    seq = rng.rand(b, 5, 6, 7, 7, C).astype(np.float32) * 0.2
    seq[:, :, 2, 3:5, 3:5, :] += 1.0  # persistent salient blob on the front face
    flows = (rng.randn(b, 5, 16, 32, 2) * 0.05).astype(np.float32)
    flows[:, :, 4:10, 8:20, 0] += 2.0  # one moving region
    return jnp.asarray(seq), jnp.asarray(flows)


def test_loss_decreases_over_steps():
    cfg = Config(input_size=C, hidden_size=C, flow_h=16, lr=1e-4,
                 compute_dtype="float32")
    params = init_clstm_params(jax.random.PRNGKey(0), C, C)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt)

    rng = np.random.RandomState(0)
    batches = [_synthetic_batch(rng) for _ in range(4)]

    losses = []
    for i in range(40):
        seq, flows = batches[i % len(batches)]
        params, opt_state, m = step(params, opt_state, seq, flows)
        losses.append(float(m["loss"]))

    assert all(np.isfinite(losses))
    first = np.mean(losses[:4])
    last = np.mean(losses[-4:])
    assert last < 0.95 * first, (first, last)


def test_gradients_nonzero_for_all_params():
    cfg = Config(input_size=C, hidden_size=C, flow_h=16, lr=1e-2,
                 compute_dtype="float32")
    params = jax.device_get(init_clstm_params(jax.random.PRNGKey(0), C, C))
    opt = make_optimizer(cfg)
    step = make_train_step(cfg, opt)
    rng = np.random.RandomState(1)
    seq, flows = _synthetic_batch(rng)
    p2, _, _ = step(jax.device_put(params), opt.init(jax.device_put(params)), seq, flows)
    for name in ("conv1", "conv2", "gates"):
        dw = np.abs(np.asarray(p2[name]["w"]) - params[name]["w"]).max()
        assert dw > 0, f"{name} weights did not move"
