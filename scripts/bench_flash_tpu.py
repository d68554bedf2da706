"""Microbench: official jax pallas TPU flash_attention vs XLA einsum attention.

CLIP ViT-B/16 head shapes (B=64, H=12, D=64), bf16, on-device lax.scan loop
(amortizes tunnel dispatch), best-of-4. Decides whether routing the encoder's
mask-free attention through the official kernel (padding 257 -> block
multiple) beats the measured XLA path (docs/BENCHMARKS.md attention table).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

B, H, D = 64, 12, 64
ITERS = 500


def xla_attn(q, k, v):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * (D**-0.5)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)


def main():
    from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention

    for seq in (256, 384, 512):
        for causal in (False, True):
            shape = (B, H, seq, D)

            def make_loop(fn):
                # chain the FULL output back as the next query (the
                # bench_attention.py guard): a scalar-slice carry would let
                # XLA dead-code most of the einsum while the opaque pallas
                # call cannot be pruned, biasing the comparison
                @jax.jit
                def loop(q, k, v):
                    def body(qc, _):
                        out = fn(qc, k, v)
                        return out.astype(jnp.bfloat16), ()

                    out, _ = jax.lax.scan(body, q, None, length=ITERS)
                    return jnp.sum(out.astype(jnp.float32))

                return loop

            def flash(q, k, v):
                return flash_attention(q, k, v, causal=causal, sm_scale=D**-0.5)

            def xla(q, k, v):
                if causal:
                    def masked(q, k, v):
                        s = jnp.einsum(
                            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
                        ) * (D**-0.5)
                        mask = jnp.tril(jnp.ones((seq, seq), bool))
                        s = jnp.where(mask[None, None], s, -1e30)
                        p = jax.nn.softmax(s, axis=-1)
                        return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)

                    return masked(q, k, v)
                return xla_attn(q, k, v)

            def fresh(seed):
                rng = np.random.default_rng(seed)
                return tuple(
                    jnp.asarray(rng.normal(size=shape).astype(np.float32), jnp.bfloat16)
                    for _ in range(3)
                )

            flops = 4 * B * H * seq * seq * D * (0.5 if causal else 1.0) * ITERS
            for name, fn in (("xla", xla), ("flash", flash)):
                loop = make_loop(fn)
                try:
                    _ = float(loop(*fresh(0)))  # compile
                    best = np.inf
                    # fresh inputs per pass: identical (program, input) pairs
                    # can be served from a backend cache on this tunnel
                    for p in range(4):
                        q, k, v = fresh(p + 1)
                        t0 = time.time()
                        _ = float(loop(q, k, v))
                        best = min(best, time.time() - t0)
                    print(
                        f"seq={seq} causal={causal} {name}: {best:.3f}s "
                        f"{flops / best / 1e12:.1f} TF/s"
                    )
                except Exception as e:
                    print(f"seq={seq} causal={causal} {name}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
