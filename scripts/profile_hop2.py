"""Round-2 hop ablations: score formulations + gather alignment + dp.

Findings from round 1 (profile_hop.py, v5e, B=4096 W=4 R=83 dp=64 L=40):
  gather 3.42ms + score 3.20ms + dedup/inlist/merge ~1.7ms = 8.28ms/hop.
This round isolates (a) the int8 batched-matvec score op, (b) row-size
tile alignment of the packed gather, (c) dp=32, (d) batch scaling.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_hop2.py
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", "/tmp/diskann_tpu_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

LOG = lambda *a: print(*a, file=sys.stderr, flush=True)

N = int(os.environ.get("PH_N", 1_000_000))
ITERS = int(os.environ.get("PH_ITERS", 24))
D = 128


def make_rand_codes(key, n, cols):
    gen = jax.jit(
        lambda k: jax.random.randint(k, (n // 8, cols), -127, 128, dtype=jnp.int8),
    )
    return jnp.concatenate(
        [gen(jax.random.fold_in(key, i)) for i in range(8)], axis=0
    )


def run_case(name, b, r, dp, score_kind, include_merge=True, w=4, l=40):
    c = w * r
    key = jax.random.key(hash(name) % (2**31))
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    adjacency = jax.random.randint(k1, (N, r), 0, N, dtype=jnp.int32)
    nbr_codes = make_rand_codes(k2, N, r * dp)
    nbr_aux = jax.random.uniform(k3, (N, r), jnp.float32, 0.0, 100.0)
    qi = jax.random.randint(k4, (b, dp), -127, 128, dtype=jnp.int8)
    qscale = jnp.full((b,), 1e-3, jnp.float32)
    qsq = jax.random.uniform(k5, (b,), jnp.float32, 0.0, 100.0)
    beam0 = jax.random.randint(key, (b, w), 0, N, dtype=jnp.int32)
    np.asarray(nbr_codes[:1, :1])

    SENT = jnp.int32(2**31 - 1)

    def hop(carry, data):
        best_d, best_i, best_exp, beam = carry
        adjacency, nbr_codes, nbr_aux, qi, qscale, qsq = data
        safe = jnp.clip(beam, 0, N - 1)
        nbrs = adjacency[safe]
        codes = nbr_codes[safe].reshape(b, c, dp)
        aux = nbr_aux[safe].reshape(b, c)
        cand = nbrs.reshape(b, c)
        if score_kind == "i8dot":
            dots_i = jax.lax.dot_general(
                qi, codes, (((1,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            )
            dots = dots_i.astype(jnp.float32) * qscale[:, None]
        elif score_kind == "bf16dot":
            dots = jax.lax.dot_general(
                qi.astype(jnp.bfloat16), codes.astype(jnp.bfloat16),
                (((1,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * qscale[:, None]
        elif score_kind == "mulred":
            prod = codes.astype(jnp.int32) * qi[:, None, :].astype(jnp.int32)
            dots = prod.sum(axis=-1).astype(jnp.float32) * qscale[:, None]
        elif score_kind == "f32dot":
            dots = jax.lax.dot_general(
                qi.astype(jnp.float32), codes.astype(jnp.float32),
                (((1,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * qscale[:, None]
        else:
            raise ValueError(score_kind)
        cd = jnp.maximum(qsq[:, None] + aux - 2.0 * dots, 0.0)
        cd = jnp.where(cand >= 0, cd, jnp.inf)
        if include_merge:
            cand_s = jnp.where(cand >= 0, cand, SENT)
            cand_s, cd = jax.lax.sort((cand_s, cd), dimension=-1, num_keys=1)
            left = jnp.concatenate(
                [jnp.full((b, 1), -2, jnp.int32), cand_s[:, :-1]], axis=-1
            )
            fresh = (cand_s != SENT) & ~(cand_s == left)
            in_list = jnp.any(
                cand_s[:, :, None] == best_i[:, None, :], axis=-1
            )
            fresh = fresh & ~in_list
            cd = jnp.where(fresh, cd, jnp.inf)
            ci = jnp.where(fresh, cand_s, -1)
            md = jnp.concatenate([best_d, cd], axis=1)
            mi = jnp.concatenate([best_i, ci], axis=1)
            me = jnp.concatenate(
                [best_exp, jnp.where(ci >= 0, 0, 1).astype(jnp.int32)], axis=1
            )
            md, mi, me = jax.lax.sort((md, mi, me), dimension=-1, num_keys=1)
            best_d, best_i, best_exp = md[:, :l], mi[:, :l], me[:, :l]
            unexp = (best_exp == 0) & (best_i >= 0)
            rank = jnp.cumsum(unexp.astype(jnp.int32), axis=1) - 1
            sel = unexp & (rank < w)
            pos_iota = jax.lax.broadcasted_iota(jnp.int32, (b, l), 1)
            sel_pos = jax.lax.sort(
                jnp.where(sel, pos_iota, l), dimension=-1
            )[:, :w]
            bv = sel_pos < l
            beam = jnp.where(
                bv,
                jnp.take_along_axis(
                    best_i, jnp.minimum(sel_pos, l - 1), axis=1
                ),
                0,
            )
            best_exp = jnp.where(sel, 1, best_exp)
        else:
            s = cd.min(axis=1)
            best_d = best_d + s[:, None] * 1e-30
            beam = (beam + 1) % N
        return (best_d, best_i, best_exp, beam), None

    def run(adjacency, nbr_codes, nbr_aux, qi, qscale, qsq, beam0):
        best_d = jnp.full((b, l), jnp.inf, jnp.float32)
        best_i = jnp.full((b, l), -1, jnp.int32)
        best_exp = jnp.ones((b, l), jnp.int32)
        data = (adjacency, nbr_codes, nbr_aux, qi, qscale, qsq)
        carry = (best_d, best_i, best_exp, beam0)
        carry, _ = jax.lax.scan(
            lambda cr, _: hop(cr, data), carry, None, length=ITERS
        )
        return carry[0]

    fn = jax.jit(run)
    t0 = time.time()
    out = fn(adjacency, nbr_codes, nbr_aux, qi, qscale, qsq, beam0)
    np.asarray(out[:1, :1])
    first = time.time() - t0
    t0 = time.time()
    out = fn(adjacency, nbr_codes, nbr_aux, qi, qscale, qsq, beam0)
    np.asarray(out[:1, :1])
    dt = time.time() - t0
    per_hop = dt / ITERS * 1e3
    LOG(f"[p2] {name:34s} {per_hop:8.3f} ms/hop (first {first:.0f}s)")
    # free device buffers before the next case
    for a in (adjacency, nbr_codes, nbr_aux):
        a.delete()
    return per_hop


def main():
    LOG(f"[p2] backend={jax.default_backend()} N={N} iters={ITERS}")
    res = {}
    # score formulation shootout (no merge, B=4096, R=83, dp=64)
    for sk in ("i8dot", "bf16dot", "mulred", "f32dot"):
        res[f"score_{sk}"] = run_case(
            f"score_{sk} b4096 r83 dp64", 4096, 83, 64, sk, include_merge=False
        )
    # tile-aligned rows: R=84 -> 84*64=5376 = 42 full (32,128) int8 tiles
    res["aligned_r84"] = run_case(
        "score_i8dot b4096 r84 dp64 ALIGNED", 4096, 84, 64, "i8dot",
        include_merge=False,
    )
    # dp=32 halves gathered bytes
    res["dp32"] = run_case(
        "score_i8dot b4096 r84 dp32", 4096, 84, 32, "i8dot",
        include_merge=False,
    )
    # full hop with the best-so-far knobs
    res["full_base"] = run_case(
        "FULL i8dot b4096 r83 dp64", 4096, 83, 64, "i8dot"
    )
    res["full_aligned"] = run_case(
        "FULL i8dot b4096 r84 dp64", 4096, 84, 64, "i8dot"
    )
    res["full_b8192"] = run_case(
        "FULL i8dot b8192 r84 dp64", 8192, 84, 64, "i8dot"
    )
    print("DONE", {k: round(v, 3) for k, v in res.items()})


if __name__ == "__main__":
    main()
