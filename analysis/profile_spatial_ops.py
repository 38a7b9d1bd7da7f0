"""Op-level bisect of one spatial-transformer pass at sweep shapes.

One offset pass = spatial transformer over (T=4096 frames, 65 tokens, 128 dim),
depth 2. Times each op class standalone to find where XLA loses the 459 ms
(= 21 offsets x this pass).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

T, N, D, HEADS, DH, MLP = 4096, 65, 128, 4, 64, 1024
INNER = HEADS * DH


def timeit(fn, *args, n=5):
    # the axon relay's block_until_ready can return before the computation
    # finishes; a host fetch of an in-graph scalar reduction is a true barrier
    f = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    float(f(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    key = jax.random.key(0)
    x = jax.random.normal(key, (T, N, D), jnp.bfloat16)
    w_qkv = jax.random.normal(key, (D, 3 * INNER), jnp.bfloat16)
    w_out = jax.random.normal(key, (INNER, D), jnp.bfloat16)
    w_ff1 = jax.random.normal(key, (D, MLP), jnp.bfloat16)
    w_ff2 = jax.random.normal(key, (MLP, D), jnp.bfloat16)
    q = jax.random.normal(key, (T, HEADS, N, DH), jnp.bfloat16)
    k, v = q + 1, q - 1

    rows = []

    def rec(name, ms, flops):
        rows.append((name, ms, flops))
        print(f"{name:34s}: {ms*1e3:8.2f} ms  {flops/ms/1e12:6.1f} TF/s")

    rec("layernorm (T*N,128) f32", timeit(
        lambda a: ((a.astype(jnp.float32) - a.astype(jnp.float32).mean(-1, keepdims=True))
                   * jax.lax.rsqrt(a.astype(jnp.float32).var(-1, keepdims=True) + 1e-6)
                   ).astype(jnp.bfloat16), x), 0)

    rec("qkv matmul (T*N,128)@(128,768)", timeit(
        lambda a, w: jnp.einsum("tnd,de->tne", a, w), x, w_qkv),
        2 * T * N * D * 3 * INNER)

    rec("attn scores bhid,bhjd->bhij", timeit(
        lambda a, b: jnp.einsum("bhid,bhjd->bhij", a, b).astype(jnp.float32), q, k),
        2 * T * HEADS * N * N * DH)

    def full_attn(qq, kk, vv):
        s = jnp.einsum("bhid,bhjd->bhij", qq, kk).astype(jnp.float32) * (DH ** -0.5)
        p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
        return jnp.einsum("bhij,bhjd->bhid", p, vv)

    rec("attn full (scores+softmax+AV)", timeit(full_attn, q, k, v),
        2 * 2 * T * HEADS * N * N * DH)

    rec("out proj (T*N,256)@(256,128)", timeit(
        lambda a, w: jnp.einsum("tni,id->tnd", a, w),
        jax.random.normal(key, (T, N, INNER), jnp.bfloat16), w_out),
        2 * T * N * INNER * D)

    rec("ff1 (T*N,128)@(128,1024)+gelu", timeit(
        lambda a, w: jax.nn.gelu(jnp.einsum("tnd,dm->tnm", a, w)), x, w_ff1),
        2 * T * N * D * MLP)

    rec("ff2 (T*N,1024)@(1024,128)", timeit(
        lambda a, w: jnp.einsum("tnm,md->tnd", a, w),
        jax.random.normal(key, (T, N, MLP), jnp.bfloat16), w_ff2),
        2 * T * N * MLP * D)

    print("-" * 60)
    # one block ~= qkv + attn_full + out + ff1 + ff2 + 2 LN
    blk = rows[1][1] + rows[3][1] + rows[4][1] + rows[5][1] + rows[6][1] + 2 * rows[0][1]
    print(f"sum per transformer block        : {blk*1e3:8.2f} ms")
    print(f"x 2 blocks x 21 offsets          : {blk*2*21*1e3:8.2f} ms (measured table: ~459 ms)")


if __name__ == "__main__":
    main()
