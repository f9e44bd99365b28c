"""Probe: does AUTO layout negotiation remove the hoisted layout-copy
temps that OOM the 7B chunked-decode program?

Background (benchmarks/README.md kernel-policy log): the chunk=8 token
scan at 7B fails AOT compile with 3.53 GB of HLO temps — whole-tensor
layout-conversion copies of the stacked wq/wk/wv ([32,4096,4096] ->
{1,2,0:T(8,128)(2,1)}, i.e. contracting-dim-minor) plus both KV cache
halves, hoisted out of the token loop. The single-step program compiles
with 572 MB temps. Unrolling and optimization_barrier both failed to
stop the hoist (the conversion applies to the scan operands before
slicing).

This probe compiles the SAME chunk program with
`in_shardings=Format(Layout.AUTO)` for params+cache so XLA is free to
DEMAND its preferred operand layouts at the program boundary instead of
converting internally, then reports:
  - HLO temp size (pass = no GB-scale copies),
  - the negotiated layouts for wq/wk/wv and the cache vs the defaults,
  - the same for a prefill program PINNED to the chunk-negotiated
    layouts (both programs must agree since they share the live params).

AOT-only: lowered from ShapeDtypeStructs, nothing materialized, no
execution — one remote compile per program.
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental.layout import Format, Layout


def main(chunk: int = 8):
    from law_of_vision_representation_in_mllms_tpu.core.precision import (
        Precision)
    from law_of_vision_representation_in_mllms_tpu.models import llama

    prec = Precision(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    cfg = llama.vicuna_7b()
    b, l, n_new = 2, 512, 33

    p_shapes = jax.eval_shape(
        lambda: llama.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16))
    cache_shapes = jax.eval_shape(
        lambda: llama.init_cache(cfg, b, l + n_new, jnp.bfloat16))
    tok_s = jax.ShapeDtypeStruct((b,), jnp.int32)
    t0_s = jax.ShapeDtypeStruct((b,), jnp.int32)

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
        (cache, tok), toks = lax.scan(body, (cache, tok), jnp.arange(chunk))
        return cache, tok, jnp.transpose(toks)

    auto = Format(Layout.AUTO)
    p_auto = jax.tree.map(lambda _: auto, p_shapes)
    c_auto = jax.tree.map(lambda _: auto, cache_shapes)
    jitted = jax.jit(chunk_steps, donate_argnums=(1,),
                     in_shardings=(p_auto, c_auto, None, None),
                     out_shardings=Format(Layout.AUTO))
    print("lowering chunk program (AUTO layouts)...", flush=True)
    compiled = jitted.lower(p_shapes, cache_shapes, tok_s, t0_s).compile()
    ms = compiled.memory_analysis()
    print(f"chunk temp={ms.temp_size_in_bytes/2**30:.3f}G "
          f"args={ms.argument_size_in_bytes/2**30:.2f}G", flush=True)

    in_fmts = compiled.input_formats[0]
    p_fmts, cache_fmts = in_fmts[0], in_fmts[1]
    for name in ("wq", "wk", "wv", "wo", "gate", "down"):
        print(f"  layers/{name}: {p_fmts['layers'][name].layout}", flush=True)
    print(f"  embed: {p_fmts['embed'].layout}", flush=True)
    print(f"  lm_head: {p_fmts['lm_head'].layout}", flush=True)
    kname = "k" if "k" in cache_fmts else list(cache_fmts)[0]
    print(f"  cache[{kname}]: {cache_fmts[kname].layout}", flush=True)
    out_fmts = compiled.output_formats
    print(f"  out cache[{kname}]: "
          f"{jax.tree.leaves(out_fmts)[0].layout}", flush=True)

    # prefill pinned to the chunk-negotiated param layouts; cache OUTPUT
    # pinned to the chunk-negotiated cache input layout (cache is handed
    # from prefill to chunk by donation).
    def prefill(p, ids):
        cache = llama.init_cache(cfg, b, l + n_new, jnp.bfloat16)
        pos = jnp.broadcast_to(jnp.arange(l)[None], (b, l))
        valid = jnp.concatenate(
            [jnp.ones((b, l), bool), jnp.zeros((b, n_new), bool)], 1)
        emb = llama.embed_tokens(p, ids, prec)
        h, cache = llama.forward(p, cfg, emb, pos, attn_mask=valid,
                                 cache=cache, cache_index=0,
                                 precision=prec, use_flash=True)
        tok = jnp.argmax(llama.logits_fn(p, h[:, -1:], prec)[:, -1],
                         -1).astype(jnp.int32)
        return cache, tok

    ids_s = jax.ShapeDtypeStruct((b, l), jnp.int32)
    pf = jax.jit(prefill, in_shardings=(p_fmts, None),
                 out_shardings=(cache_fmts, None))
    print("lowering prefill (pinned to chunk layouts)...", flush=True)
    pc = pf.lower(p_shapes, ids_s).compile()
    pms = pc.memory_analysis()
    print(f"prefill temp={pms.temp_size_in_bytes/2**30:.3f}G", flush=True)
    print("PROBE OK", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
