"""Measure the fused cube-conv Pallas kernel vs XLA on the real chip.

Covers the three convs a ConvLSTM step actually executes (conv1: Cin =
input+hidden = 2000; conv2/gates: 4000 -> 4000) at small and large window
batches, forward and (for the custom-VJP wrapper) forward+backward.  Data
is generated on device with per-iteration keys and timings chain through a
lazy accumulator (the transfer tunnel dedups repeated buffers and lies to
block_until_ready — see CLAUDE.md).

Prints a markdown table of TFLOP/s (9-tap selection FLOPs excluded on both
sides — only the conv's useful FLOPs are credited).

CAVEAT on the "XLA fwd" column: a *standalone-jitted* cube-pad+conv is
pathologically slow on this libtpu (measured 4.3 s for a 677 GFLOP conv =
0.16 TF/s; the same conv INSIDE the jitted train-step scan runs at
~105 TF/s effective).  The honest XLA baseline for kernel decisions is the
in-context number from the train-step ablation, not this column.

Usage: python tools/bench_pallas.py [n_iters=8]
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from cp360_tpu.ops.pallas_kernels import (  # noqa: E402
    cube_conv3x3,
    cube_conv3x3_reference,
    cube_conv3x3_train,
)

SHAPES = [  # (N windows, Cin, Cout) — conv1 and conv2/gates at two batches
    (4, 2000, 4000),
    (16, 2000, 4000),
    (16, 4000, 4000),
]


def flops(n, cin, cout):
    return n * 294 * 9 * cin * cout * 2


def bench(fn, make, n_iters):
    x, w, b = make(999)
    fn(x, w, b).block_until_ready()
    acc = jnp.zeros((), jnp.float32)
    t0 = time.time()
    for i in range(n_iters):
        x, w, b = make(i)
        out = fn(x, w, b)
        acc = acc + jnp.sum(out[0, 0, 0, 0].astype(jnp.float32))
    assert np.isfinite(float(acc))
    return (time.time() - t0) / n_iters


def main():
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    dt = jnp.bfloat16

    print("| shape [N,6,7,7,Cin]->Cout | XLA fwd | Pallas fwd | XLA train | Pallas train |")
    print("|---|---|---|---|---|")
    for n, cin, cout in SHAPES:
        @partial(jax.jit, static_argnames=("i",))
        def make(i, n=n, cin=cin, cout=cout):
            k = jax.random.fold_in(jax.random.PRNGKey(0), i)
            k1, k2, k3 = jax.random.split(k, 3)
            x = jax.random.normal(k1, (n, 6, 7, 7, cin), dt)
            w = jax.random.normal(k2, (3, 3, cin, cout), dt) * 0.02
            b = jax.random.normal(k3, (cout,), dt)
            return x, w, b

        make_i = lambda i: make(i)  # noqa: E731

        xla_f = jax.jit(cube_conv3x3_reference)
        pal_f = jax.jit(cube_conv3x3)

        def train_of(conv):
            def loss(x, w, b):
                return jnp.sum(conv(x, w, b).astype(jnp.float32) ** 2)

            g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

            def step(x, w, b):
                dx, dw, db = g(x, w, b)
                return dx  # chained through acc slicing in bench()

            return step

        xla_t = train_of(cube_conv3x3_reference)
        pal_t = train_of(lambda x, w, b: cube_conv3x3_train(x, w, b))

        f = flops(n, cin, cout)
        cells = []
        for tag, fn, mult in (("xla_f", xla_f, 1), ("pal_f", pal_f, 1),
                              ("xla_t", xla_t, 3), ("pal_t", pal_t, 3)):
            sec = bench(fn, make_i, n_iters)
            cells.append(f"{f * mult / sec / 1e12:.0f} TF/s ({sec*1e3:.1f} ms)")
            print(f"  .. [{n},{cin}->{cout}] {tag}: {cells[-1]}",
                  file=sys.stderr, flush=True)
        print(f"| [{n},6,7,7,{cin}]->{cout} | " + " | ".join(cells) + " |", flush=True)


if __name__ == "__main__":
    main()
