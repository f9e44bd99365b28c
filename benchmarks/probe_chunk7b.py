"""Probe: which chunk sizes of the 7B in-program decode scan compile.
One chunk size per run (remote compiles are slow): argv[1] = chunk."""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(chunk: int):  # noqa: C901
    import jax
    import jax.numpy as jnp
    from jax import lax
    from law_of_vision_representation_in_mllms_tpu.core.precision import (
        Precision)
    from law_of_vision_representation_in_mllms_tpu.models import llama

    prec = Precision(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    cfg = llama.vicuna_7b()
    params = jax.jit(lambda k: llama.init_params(k, cfg, jnp.bfloat16))(
        jax.random.PRNGKey(0))
    b, l, n_new = 2, 512, 33
    rng = np.random.RandomState(3)
    ids = jnp.asarray(rng.randint(1, 32000, size=(b, l)).astype(np.int32))

    @jax.jit
    def prefill(p, i):
        cache = llama.init_cache(cfg, b, l + n_new, jnp.bfloat16)
        pos = jnp.broadcast_to(jnp.arange(l)[None], (b, l))
        valid = jnp.concatenate(
            [jnp.ones((b, l), bool), jnp.zeros((b, n_new), bool)], 1)
        emb = llama.embed_tokens(p, i, prec)
        h, cache = llama.forward(p, cfg, emb, pos, attn_mask=valid,
                                 cache=cache, cache_index=0,
                                 precision=prec, use_flash=True)
        tok = jnp.argmax(llama.logits_fn(p, h[:, -1:], prec)[:, -1],
                         -1).astype(jnp.int32)
        return cache, tok

    unroll = os.environ.get("LVR_CHUNK_UNROLL") == "1"
    if os.environ.get("LVR_CHUNK_BARRIER") == "1":
        # pin per-layer weight slices to their incoming layout inside the
        # layer scan: defeats the hoisted whole-tensor layout copies
        # (3x1GB wq/wk/wv HLO temps) that OOM the 7B chunk program
        _orig_layer = llama._layer

        def _barrier_layer(cfg_, h_, lp_, *a, **kw):
            lp_ = jax.lax.optimization_barrier(lp_)
            return _orig_layer(cfg_, h_, lp_, *a, **kw)
        llama._layer = _barrier_layer

    @functools.partial(jax.jit, donate_argnums=(1,))
    def chunk_steps(p, cache, tok, t0):
        def body(carry, i):
            cache, tok = carry
            t = t0 + i
            e = llama.embed_tokens(p, tok[:, None], prec)
            sv = jnp.concatenate(
                [jnp.ones((b, l), bool),
                 jnp.broadcast_to(jnp.arange(n_new)[None] <= t[:, None] - l,
                                  (b, n_new))], 1)
            h, cache = llama.forward(p, cfg, e, t[:, None], attn_mask=sv,
                                     cache=cache, cache_index=t[0],
                                     precision=prec)
            nxt = jnp.argmax(llama.logits_fn(p, h, prec)[:, -1],
                             -1).astype(jnp.int32)
            return (cache, nxt), tok
        if unroll:
            outs = []
            carry = (cache, tok)
            for i in range(chunk):
                carry, emitted = body(carry, jnp.int32(i))
                outs.append(emitted)
            cache, tok = carry
            return cache, tok, jnp.stack(outs, axis=1)
        (cache, tok), toks = lax.scan(body, (cache, tok),
                                      jnp.arange(chunk))
        return cache, tok, jnp.transpose(toks)

    cache, tok = prefill(params, ids)
    t_arr = jnp.full((b,), l, jnp.int32)
    t0 = time.perf_counter()
    cache, tok, _ = chunk_steps(params, cache, tok, t_arr)
    print(f"chunk={chunk} compile+run1: {time.perf_counter()-t0:.1f}s "
          f"tok={int(tok[0])}", flush=True)
    cache, tok = prefill(params, ids)
    n_chunks = max(1, (n_new - 1) // chunk)
    t0 = time.perf_counter()
    for ci in range(n_chunks):
        cache, tok, toks = chunk_steps(params, cache, tok,
                                       t_arr + jnp.int32(ci * chunk))
    _ = int(tok[0])
    per_tok = (time.perf_counter() - t0) / (n_chunks * chunk)
    print(f"chunk={chunk}: {b/per_tok:.1f} tok/s "
          f"({n_chunks} dispatches x {chunk})", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
