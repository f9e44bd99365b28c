"""Continuous (in-flight) batching decode engine for serving.

The reference serves through sglang (`lmms_eval/models/llava_sglang.py`),
whose core scheduling idea is continuous batching: requests join and leave
a running decode batch between steps instead of waiting for a whole wave
to finish. `lvr serve`'s default `_BatchWorker` is wave-based (one
`generate_until` per co-arrival window); this engine is the TPU-native
continuous scheduler:

- A fixed pool of ``n_slots`` decode slots shares ONE global KV cache
  ``[L, n_slots, t_max, KV, Dh]`` — fixed shapes, so every program
  compiles once.
- Admission = a b=k prefill (prompts bucketed to powers of two, queued
  same-bucket requests batched into one dispatch) whose local cache rows
  are spliced into the slots with donated `dynamic_update_slice`s (no
  steady-state copies of the global cache).
- Decoding = ONE program advancing ALL slots `chunk` tokens: the
  per-slot step is the same embed → `llama.forward(cache)` → argmax used
  everywhere else, `jax.vmap`-ed over the slot axis so every slot keeps
  its OWN cache position / RoPE position / validity mask (a fresh request
  decodes token 3 while its neighbour decodes token 90). Weights
  broadcast; the vmapped b=1 einsums batch back onto the MXU.
- Between chunks the host harvests tokens, retires slots on EOS or their
  per-request token budget, and admits queued requests into freed slots
  — requests never wait for the batch, only for a free slot.

Inactive slots ride along as masked garbage (fixed shapes are the TPU
contract); their K/V rows are overwritten at the next admission and are
never read unmasked. Greedy-equivalence per request is asserted against
`llava.generate_greedy` in tests/test_inflight.py, including staggered
admissions.

Prompt KV caching (``prefix_cache=N``): sglang's headline scheduler
feature is RadixAttention — KV reuse across requests sharing a prompt
prefix (`llava_sglang.py` inherits it from the runtime). Its dominant
serving case is the DEGENERATE prefix: the whole prompt repeats (same
system prompt + same image re-asked, retries, multi-user canned
prompts). This engine caches that case exactly: each admitted prompt's
KV rows (plus first token / position / validity row) are kept in an LRU
of N entries keyed by the request's token ids + pixel bytes; a hit
admits by splicing the stored rows straight into a slot — ZERO prefill
FLOPs, no tower pass, no dispatch beyond the donated row install.
PARTIAL-prefix reuse (round 4) covers the shared-system-prompt case the
exact match misses: a new prompt sharing a leading run of tokens (and
the same image) with any stored entry reuses that entry's first `p`
spliced KV positions — `p` = the longest common prefix rounded down to
``prefix_block`` — and prefills only the text suffix from position `p`
through one bucketed suffix program (no tower pass, no full prefill).
The combined prompt is stored back, so exact repeats of the new prompt
then hit fully. Suffixes containing the image token fall back to the
full prefill (a tower pass is needed anyway).

Per-slot sampling: `submit(..., temperature=, top_p=)` decodes that
request by temperature/top-p sampling (models/sampling.py) while its
neighbours stay greedy — ONE step program covers mixed slots (the
temperature rides in as data; `temperature <= 0` rows take
sample_token's exact-argmax fallback). The first generated token comes
from the prefill's last-position logits, drawn host-side so the prompt
KV store stays sampling-agnostic (a cached prompt redraws its first
token on every sampled hit).
"""

from __future__ import annotations

import hashlib
import queue
import threading
from collections import OrderedDict
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core.precision import Precision, DEFAULT_PRECISION
from . import llama as L
from . import llava as M
from .splice import (IGNORE_INDEX, IMAGE_TOKEN_INDEX, splice_plan,
                     splice_embeds)


def _bucket(n: int, minimum: int = 32) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


class _Request:
    __slots__ = ("ids", "mask", "pixels", "max_new", "tokens", "event",
                 "error", "stream_q", "cancelled", "key", "pixkey",
                 "temperature", "top_p")

    def __init__(self, ids, mask, pixels, max_new, temperature=0.0,
                 top_p=1.0):
        self.ids = ids
        self.mask = mask
        self.pixels = pixels
        self.max_new = max_new
        self.temperature = temperature
        self.top_p = top_p
        self.key: Optional[bytes] = None   # prompt-cache key (lazy)
        self.pixkey: Optional[bytes] = None  # pixels-only hash (lazy)
        self.tokens: List[int] = []
        self.event = threading.Event()
        self.error: Optional[Exception] = None
        # live token feed for streaming consumers (None = end of stream)
        self.stream_q: "queue.Queue[Optional[int]]" = queue.Queue()
        self.cancelled = False

    def cancel(self):
        """Ask the engine to stop decoding this request (client hung up /
        stop string hit). The slot frees at the next harvest; already-
        generated tokens stay available via result()."""
        self.cancelled = True

    def result(self, timeout: Optional[float] = None) -> np.ndarray:
        if not self.event.wait(timeout):
            raise TimeoutError("inflight request timed out")
        if self.error is not None:
            raise self.error
        return np.asarray(self.tokens, np.int32)

    def iter_tokens(self, timeout: Optional[float] = 600):
        """Yield token ids as the engine produces them (SSE streaming);
        raises the request's error, if any, at end of stream."""
        while True:
            tok = self.stream_q.get(timeout=timeout)
            if tok is None:
                break
            yield tok
        if self.error is not None:
            raise self.error


class InflightEngine:
    """Slot-pool continuous-batching engine over one model's params."""

    def __init__(self, params, cfg: M.LlavaConfig, *, eos_id: int,
                 n_slots: int = 4, prompt_cap: int = 256,
                 gen_cap: int = 256, chunk: int = 4,
                 precision: Precision = DEFAULT_PRECISION,
                 diffusion_apply=None, use_flash: Optional[bool] = None,
                 negotiate_layouts: bool = False,
                 prefix_cache: int = 0, prefix_block: int = 64,
                 prefix_cache_bytes: int = 0,
                 sample_seed: int = 0):
        """``negotiate_layouts=True`` compiles the slot-step program with
        AUTO boundary layouts and relays out the params + cache ONCE into
        XLA's negotiated formats, CONSUMING the source buffers — the same
        contract as `ChunkedGreedyDecoder(negotiate_layouts=True)` and
        REQUIRED at 7B, where default layouts make XLA hoist 3 GB of
        weight layout-conversion copies out of the decode loop and OOM
        the chip (models/layouts.py). Callers sharing the param tree must
        re-read ``self.params`` after the first admission."""
        self.params = params
        self.cfg = cfg
        self.eos_id = eos_id
        self.n_slots = n_slots
        self.prompt_cap = prompt_cap
        self.gen_cap = gen_cap
        self.chunk = chunk
        self.precision = precision
        self.diffusion_apply = diffusion_apply
        if use_flash is None:
            use_flash = jax.default_backend() == "tpu"
        self.use_flash = use_flash
        # prompt slots cover the LONGEST bucket's spliced length; shorter
        # prompts mask the tail (prompt_row False there)
        self.l_out_max = prompt_cap + cfg.num_patches - 1
        self.t_max = self.l_out_max + gen_cap

        self.cache = L.init_cache(cfg.decoder, n_slots, self.t_max,
                                  precision.compute_dtype,
                                  quant=cfg.kv_quant)
        self._prefill_fns: Dict = {}
        self._step_fn = None
        self._install_fns: Dict[int, callable] = {}
        self._extract_fns: Dict[int, callable] = {}
        # prompt-KV LRU: key -> (k=1 local cache, first, last_logits,
        # n_valid, prow, valid token ids, pixel hash, image-token index)
        self.prefix_cache = prefix_cache
        self.prefix_block = prefix_block
        # optional BYTE budget for the store (0 = entry-count bound
        # only). At 7B one stored prompt row is ~800 MB bf16 / ~400 MB
        # int8, so an entry-count LRU alone scales with model size until
        # it OOMs the chip; a byte budget is the production bound.
        self.prefix_cache_bytes = prefix_cache_bytes
        self._prefix_bytes = 0
        self._prefix_store: "OrderedDict[bytes, tuple]" = OrderedDict()
        self.prefix_hits = 0
        self.partial_hits = 0
        self._suffix_fns: Dict = {}
        self.negotiate_layouts = negotiate_layouts
        self._param_formats = None
        self._cache_formats = None
        self._local_cache_formats: Dict = {}

        # host-side slot state
        self._slot_req: List[Optional[_Request]] = [None] * n_slots
        self._tok = np.full((n_slots,), eos_id, np.int32)
        self._pos = np.zeros((n_slots,), np.int32)
        self._t = np.zeros((n_slots,), np.int32)
        self._prompt_rows = np.zeros((n_slots, self.l_out_max), bool)
        self._active = np.zeros((n_slots,), bool)
        # per-slot sampling knobs (temperature <= 0 = greedy; the step
        # program is ONE compilation covering mixed greedy/sampled slots)
        self._temp = np.zeros((n_slots,), np.float32)
        self._topp = np.ones((n_slots,), np.float32)
        self._rng = jax.random.PRNGKey(sample_seed)
        self._np_rng = np.random.RandomState(sample_seed)

        self._q: "queue.Queue[_Request]" = queue.Queue()
        self._stop = False
        self.dispatches = 0
        self.tokens_out = 0            # harvested (delivered) tokens
        self.admissions = 0
        self.completions = 0
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    # ---------------- compiled programs ----------------

    def _prefill(self, l: int, k: int):
        """b=k prefill for prompt bucket `l`: local full-length caches +
        first tokens + spliced validity rows. k>1 = batched admission (a
        burst of arrivals prefills in ONE dispatch, like the wave
        batcher, then decodes continuously)."""
        if (l, k) in self._prefill_fns:
            return self._prefill_fns[(l, k)]
        cfg, prec = self.cfg, self.precision
        diffusion_apply = self.diffusion_apply
        t_max, use_flash = self.t_max, self.use_flash

        def fn(params, ids, mask, pixels):
            plan = splice_plan(ids, jnp.full_like(ids, IGNORE_INDEX), mask,
                               cfg.num_patches)
            img = M.encode_images(params, cfg, pixels, prec,
                                  diffusion_apply)
            txt = L.embed_tokens(params["decoder"], ids, prec)
            embeds = splice_embeds(plan, txt, img)
            b = ids.shape[0]
            cache = L.init_cache(cfg.decoder, b, t_max, prec.compute_dtype,
                                 quant=cfg.kv_quant)
            l_out = embeds.shape[1]
            slot_valid = jnp.concatenate(
                [plan.attn_mask,
                 jnp.zeros((b, t_max - l_out), bool)], axis=1)
            h, cache = L.forward(params["decoder"], cfg.decoder, embeds,
                                 plan.positions, attn_mask=slot_valid,
                                 cache=cache, cache_index=0,
                                 precision=prec, use_flash=use_flash)
            n_valid = jnp.sum(plan.attn_mask, axis=1)
            h_last = jnp.take_along_axis(
                h, jnp.maximum(n_valid - 1, 0)[:, None, None], axis=1)[:, 0]
            logits = L.logits_fn(params["decoder"], h_last[:, None], prec)
            first = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            # last-position logits let the host sample the FIRST token of
            # temperature>0 requests (decode steps sample in-program)
            return (cache, first, n_valid, plan.attn_mask,
                    logits[:, -1].astype(jnp.float32))

        if not self.negotiate_layouts:
            self._prefill_fns[(l, k)] = jax.jit(fn)
            return self._prefill_fns[(l, k)]
        # AOT pinned to the step program's negotiated param formats and
        # the install program's local-cache format (models/layouts.py)
        from . import layouts as LY
        sds = jax.ShapeDtypeStruct
        p_shapes = LY.shape_spec(self.params)
        ids_s, mask_s = sds((k, l), jnp.int32), sds((k, l), jnp.bool_)
        px_s = [sds((k,) + tuple(p.shape[1:]), p.dtype)
                for p in self._px_spec]
        self._prefill_fns[(l, k)] = jax.jit(
            fn,
            in_shardings=(self._param_formats, None, None, None),
            out_shardings=(self._local_cache_formats[k], None, None,
                           None, None),
        ).lower(p_shapes, ids_s, mask_s, px_s).compile()
        return self._prefill_fns[(l, k)]

    def _install(self, k: int):
        """Splice row `src` of a b=k prefill cache into the global cache's
        slot rows (donated: the global cache updates in place)."""
        if k in self._install_fns:
            return self._install_fns[k]

        def fn(global_cache, local_cache, src, slot):
            def upd(g, lo):
                # rank-agnostic (batch is axis 1): int8 caches carry 4-D
                # scale leaves alongside the 5-D code buffers
                row = lax.dynamic_slice(
                    lo, (0, src) + (0,) * (lo.ndim - 2),
                    (lo.shape[0], 1) + lo.shape[2:])
                return lax.dynamic_update_slice(
                    g, row.astype(g.dtype),
                    (0, slot) + (0,) * (lo.ndim - 2))
            return jax.tree.map(upd, global_cache, local_cache)

        if not self.negotiate_layouts:
            self._install_fns[k] = jax.jit(fn, donate_argnums=(0,))
            return self._install_fns[k]
        # global cache pinned to the step's negotiated format; the local
        # (b=k) cache negotiates its own — prefill pins its output to it
        from . import layouts as LY
        local_shapes = LY.shape_spec(jax.eval_shape(
            lambda: L.init_cache(self.cfg.decoder, k, self.t_max,
                                 self.precision.compute_dtype,
                                 quant=self.cfg.kv_quant)))
        zi = jax.ShapeDtypeStruct((), jnp.int32)
        inst_c = jax.jit(
            fn, donate_argnums=(0,),
            in_shardings=(self._cache_formats,
                          LY.auto_spec(local_shapes), None, None),
            out_shardings=self._cache_formats,
        ).lower(LY.shape_spec(self.cache), local_shapes, zi, zi).compile()
        self._local_cache_formats[k] = inst_c.input_formats[0][1]
        self._install_fns[k] = inst_c
        return self._install_fns[k]

    def _extract(self, k: int):
        """Slice row `src` of a b=k prefill cache into a standalone k=1
        cache (the prompt-KV store's entry format; `_install(1)` splices
        it back into any slot on a hit)."""
        if k in self._extract_fns:
            return self._extract_fns[k]

        def fn(local, src):
            return jax.tree.map(
                lambda lo: lax.dynamic_slice(
                    lo, (0, src) + (0,) * (lo.ndim - 2),
                    (lo.shape[0], 1) + lo.shape[2:]),
                local)

        if not self.negotiate_layouts:
            self._extract_fns[k] = jax.jit(fn)
            return self._extract_fns[k]
        # entries live in the k=1 local-cache format `_install(1)`
        # negotiated, so hits install with zero layout conversions
        from . import layouts as LY
        self._install(1)
        local_shapes = LY.shape_spec(jax.eval_shape(
            lambda: L.init_cache(self.cfg.decoder, k, self.t_max,
                                 self.precision.compute_dtype,
                                 quant=self.cfg.kv_quant)))
        zi = jax.ShapeDtypeStruct((), jnp.int32)
        self._extract_fns[k] = jax.jit(
            fn,
            in_shardings=(self._local_cache_formats[k], None),
            out_shardings=self._local_cache_formats[1],
        ).lower(local_shapes, zi).compile()
        return self._extract_fns[k]

    @staticmethod
    def _entry_nbytes(entry: tuple) -> int:
        """Device+host bytes one stored prompt entry holds (the KV row
        tree dominates; quantized caches count their packed bytes)."""
        import jax as _jax
        n = 0
        for leaf in _jax.tree.leaves(entry):
            if hasattr(leaf, "nbytes"):
                n += int(leaf.nbytes)
        return n

    def _store_put(self, key: bytes, entry: tuple) -> None:
        """Insert into the prompt-KV LRU and evict to BOTH bounds: the
        entry-count cap (`prefix_cache`) and, when set, the byte budget
        (`prefix_cache_bytes`). The newest entry always survives — a
        single over-budget entry would otherwise empty the store and
        kill partial-prefix reuse entirely."""
        self._prefix_store[key] = entry
        self._prefix_bytes += self._entry_nbytes(entry)
        while len(self._prefix_store) > 1 and (
                len(self._prefix_store) > self.prefix_cache
                or (self.prefix_cache_bytes > 0
                    and self._prefix_bytes > self.prefix_cache_bytes)):
            _, old = self._prefix_store.popitem(last=False)
            self._prefix_bytes -= self._entry_nbytes(old)

    @staticmethod
    def _prefix_key(req: _Request) -> bytes:
        """Exact-prompt identity: token ids + mask + raw pixel bytes (the
        image IS part of the prompt — same text with a different image
        must miss)."""
        if req.key is None:
            h = hashlib.sha1()
            h.update(req.ids.tobytes())
            h.update(req.mask.tobytes())
            for p in req.pixels:
                a = np.asarray(p)
                h.update(str(a.shape).encode())
                h.update(np.ascontiguousarray(a).tobytes())
            req.key = h.digest()
        return req.key

    @staticmethod
    def _pix_key(req: _Request) -> bytes:
        """Pixels-only identity (partial-prefix matching: two requests
        sharing leading text + the SAME image can share spliced KV)."""
        if req.pixkey is None:
            h = hashlib.sha1()
            for p in req.pixels:
                a = np.asarray(p)
                h.update(str(a.shape).encode())
                h.update(np.ascontiguousarray(a).tobytes())
            req.pixkey = h.digest()
        return req.pixkey

    @staticmethod
    def _valid_ids(ids, mask) -> np.ndarray:
        return np.asarray(ids[0])[np.asarray(mask[0])]

    def _find_partial(self, req: _Request):
        """Longest-common-prefix match against the prompt-KV store,
        rounded DOWN to `prefix_block` spliced positions (VERDICT r3 #7
        — the shared-system-prompt case the exact-match cache misses).

        Returns (store_key, p, suffix_ids) where p is the reusable
        spliced-KV length and suffix_ids the remaining TEXT tokens to
        prefill from position p — or None. Constraints: the image token
        (and the same image) must sit inside the shared prefix, and p
        must clear the spliced image span, so the suffix is pure text
        (a suffix containing the image would need a tower pass — at
        that point the full prefill path is the right tool)."""
        if self.prefix_cache <= 0 or not self._prefix_store:
            return None
        r_ids = self._valid_ids(req.ids, req.mask)
        img_pos = np.nonzero(r_ids == IMAGE_TOKEN_INDEX)[0]
        if len(img_pos) != 1:
            return None
        idx_img = int(img_pos[0])
        npatch = self.cfg.num_patches
        pk = self._pix_key(req)
        best = None
        for key, ent in self._prefix_store.items():
            e_ids, e_pk = ent[5], ent[6]
            if e_pk != pk:
                continue
            n = min(len(r_ids), len(e_ids))
            neq = np.nonzero(r_ids[:n] != e_ids[:n])[0]
            c = int(neq[0]) if len(neq) else n
            if c <= idx_img:            # image not inside the shared part
                continue
            sp = c - 1 + npatch         # spliced common length
            p = (sp // self.prefix_block) * self.prefix_block
            # suffix must be pure text: clear the spliced image span
            if p < idx_img + npatch or p < self.prefix_block:
                continue
            sp_total = len(r_ids) - 1 + npatch
            if p >= sp_total:           # exact repeat — full-hit path
                continue
            if best is None or p > best[1]:
                best = (key, p)
        if best is None:
            return None
        key, p = best
        suffix_ids = r_ids[p - npatch + 1:]
        s_buck = _bucket(len(suffix_ids), minimum=16)
        if p + s_buck > self.t_max:     # padded suffix must fit the slots
            return None
        return key, p, suffix_ids

    def _suffix_prefill(self, s_buck: int):
        """Text-only prefill of a padded `s_buck`-token suffix from a
        mid-cache position `p` over a k=1 local cache (a prompt-KV store
        entry): the partial-prefix admission program. One program per
        suffix bucket (VERDICT r3 #7's 'one extra suffix program')."""
        if s_buck in self._suffix_fns:
            return self._suffix_fns[s_buck]
        cfg, prec = self.cfg, self.precision

        def fn(params, row, ids_suf, suf_mask, p, key_valid):
            emb = L.embed_tokens(params["decoder"], ids_suf, prec)
            pos = p + jnp.arange(s_buck)[None]
            h, row = L.forward(params["decoder"], cfg.decoder, emb, pos,
                               attn_mask=key_valid, cache=row,
                               cache_index=p, precision=prec)
            n_suf = jnp.sum(suf_mask, axis=1)
            h_last = jnp.take_along_axis(
                h, jnp.maximum(n_suf - 1, 0)[:, None, None], axis=1)[:, 0]
            logits = L.logits_fn(params["decoder"], h_last[:, None],
                                 prec)[:, -1]
            first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return row, first, logits.astype(jnp.float32)

        if not self.negotiate_layouts:
            self._suffix_fns[s_buck] = jax.jit(fn)
            return self._suffix_fns[s_buck]
        # entry rows live in the negotiated k=1 local-cache format; keep
        # the suffix program's row operand AND result pinned to it so
        # hits run with zero layout conversions (models/layouts.py)
        from . import layouts as LY
        self._install(1)
        sds = jax.ShapeDtypeStruct
        row_shapes = LY.shape_spec(jax.eval_shape(
            lambda: L.init_cache(cfg.decoder, 1, self.t_max,
                                 prec.compute_dtype,
                                 quant=cfg.kv_quant)))
        self._suffix_fns[s_buck] = jax.jit(
            fn,
            in_shardings=(self._param_formats,
                          self._local_cache_formats[1], None, None, None,
                          None),
            out_shardings=(self._local_cache_formats[1], None, None),
        ).lower(LY.shape_spec(self.params), row_shapes,
                sds((1, s_buck), jnp.int32), sds((1, s_buck), jnp.bool_),
                sds((), jnp.int32), sds((1, self.t_max), jnp.bool_)
                ).compile()
        return self._suffix_fns[s_buck]

    def _step(self):
        """One program: advance every slot `chunk` greedy tokens with
        per-slot cache positions (vmapped single-row step)."""
        if self._step_fn is not None:
            return self._step_fn
        cfg, prec = self.cfg, self.precision
        l_out_max, gen_cap, chunk = self.l_out_max, self.gen_cap, self.chunk
        eos_id = self.eos_id

        from .sampling import sample_token

        def row_step(params, cache_row, tok, pos, t, prompt_row, temp,
                     topp, key):
            # re-grow the singleton batch axis the vmap stripped
            cache = jax.tree.map(lambda x: x[:, None], cache_row)
            emb = L.embed_tokens(params["decoder"], tok[None, None], prec)
            gen_valid = jnp.arange(gen_cap) <= t
            sv = jnp.concatenate([prompt_row, gen_valid])[None]
            h, cache = L.forward(params["decoder"], cfg.decoder, emb,
                                 pos[None, None], attn_mask=sv,
                                 cache=cache, cache_index=l_out_max + t,
                                 precision=prec)
            logits = L.logits_fn(params["decoder"], h, prec)
            # per-slot temperature/top-p; temp <= 0 = exact argmax
            nxt = sample_token(logits[0, -1], key, temp, topp)
            return jax.tree.map(lambda x: x[:, 0], cache), nxt

        def fn(params, cache, tok, pos, t, prompt_rows, temps, topps, rng):
            def body(carry, _):
                cache, tok, pos, t, rng = carry
                rng, sub = jax.random.split(rng)
                keys = jax.random.split(sub, tok.shape[0])
                cache, nxt = jax.vmap(
                    row_step, in_axes=(None, 1, 0, 0, 0, 0, 0, 0, 0),
                    out_axes=(1, 0)
                )(params, cache, tok, pos, t, prompt_rows, temps, topps,
                  keys)
                # EOS rows emit EOS forever (same as generate_greedy); the
                # host retires them between chunks
                nxt = jnp.where(tok == eos_id, eos_id, nxt)
                return (cache, nxt, pos + 1, t + 1, rng), tok
            (cache, tok, pos, t, _), toks = lax.scan(
                body, (cache, tok, pos, t, rng), None, length=chunk)
            return cache, tok, pos, t, jnp.transpose(toks)

        if not self.negotiate_layouts:
            self._step_fn = jax.jit(fn, donate_argnums=(1,))
            return self._step_fn
        # AOT with AUTO boundary layouts — XLA demands its preferred
        # weight/cache layouts at the program boundary instead of hoisting
        # whole-tensor conversion copies out of the decode scan (the 7B
        # OOM, models/layouts.py); params + cache relaid out ONCE below.
        from . import layouts as LY
        from jax.experimental.layout import Format, Layout
        sds = jax.ShapeDtypeStruct
        p_shapes = LY.shape_spec(self.params)
        n = self.n_slots
        step_c = jax.jit(
            fn, donate_argnums=(1,),
            in_shardings=(LY.auto_spec(p_shapes), Format(Layout.AUTO),
                          None, None, None, None, None, None, None),
            out_shardings=(Format(Layout.AUTO), None, None, None, None),
        ).lower(p_shapes, LY.shape_spec(self.cache),
                sds((n,), jnp.int32), sds((n,), jnp.int32),
                sds((n,), jnp.int32),
                sds((n, self.l_out_max), jnp.bool_),
                sds((n,), jnp.float32), sds((n,), jnp.float32),
                jax.ShapeDtypeStruct(self._rng.shape,
                                     self._rng.dtype)).compile()
        self._param_formats = step_c.input_formats[0][0]
        self._cache_formats = step_c.input_formats[0][1]
        self.params = LY.relayout(self.params, self._param_formats,
                                  consume=True)
        self.cache = LY.relayout(self.cache, self._cache_formats,
                                 consume=True)
        self._step_fn = step_c
        return self._step_fn

    # ---------------- public API ----------------

    def submit(self, input_ids: np.ndarray, text_mask: np.ndarray,
               pixel_values, max_new_tokens: int,
               temperature: float = 0.0, top_p: float = 1.0) -> _Request:
        """Queue one request (b=1 arrays). Returns a handle whose
        `.result()` blocks for the generated token ids (EOS excluded).
        `temperature > 0` decodes this request by temperature/top-p
        sampling (per-slot; neighbours stay greedy) — the reference's
        `do_sample = temperature > 0` contract."""
        if self._stop:
            raise RuntimeError("engine is shut down")
        l = int(input_ids.shape[-1])
        if l > self.prompt_cap:
            raise ValueError(f"prompt length {l} exceeds the engine's "
                             f"prompt_cap {self.prompt_cap}")
        req = _Request(np.asarray(input_ids, np.int32).reshape(1, -1),
                       np.asarray(text_mask, bool).reshape(1, -1),
                       pixel_values,
                       min(int(max_new_tokens), self.gen_cap),
                       float(temperature), float(top_p))
        self._q.put(req)
        return req

    def _first_token(self, req: _Request, greedy_first: int,
                     logits_row: np.ndarray) -> int:
        """First generated token from the prefill's last-position logits:
        argmax for greedy requests, host-side temperature/top-p draw
        (same semantics as models/sampling.py) for sampled ones."""
        if req.temperature <= 0:
            return greedy_first
        z = logits_row.astype(np.float64) / max(req.temperature, 1e-6)
        order = np.argsort(-z)
        p = np.exp(z[order] - z[order].max())
        p /= p.sum()
        keep = (np.cumsum(p) - p) <= req.top_p
        p = np.where(keep, p, 0.0)
        p /= p.sum()
        return int(order[self._np_rng.choice(len(p), p=p)])

    def stats(self) -> Dict[str, int]:
        """Scheduler observability (served under `lvr serve` /health)."""
        return {"dispatches": self.dispatches,
                "tokens_out": self.tokens_out,
                "admissions": self.admissions,
                "completions": self.completions,
                "active_slots": int(self._active.sum()),
                "n_slots": self.n_slots,
                "queued": self._q.qsize(),
                "prefix_hits": self.prefix_hits,
                "partial_hits": self.partial_hits,
                "prefix_entries": len(self._prefix_store),
                "prefix_bytes": self._prefix_bytes}

    def shutdown(self):
        self._stop = True
        self._thread.join(timeout=5)
        while True:
            try:
                req = self._q.get_nowait()
            except queue.Empty:
                break
            req.error = RuntimeError("engine shutting down")
            req.stream_q.put(None)
            req.event.set()

    # ---------------- scheduler loop ----------------

    def _admit_group(self, group):
        """Admit requests sharing one prompt bucket in ONE prefill
        dispatch. group: list of (request, slot) pairs; k pads to a power
        of two (rows beyond the real requests repeat row 0 and are
        discarded) so a burst of arrivals costs ~one prefill, like the
        wave batcher — but each admitted slot then decodes continuously."""
        reqs = [r for r, _ in group]
        # bucket for few compiles, but never past the prompt slot region
        l = min(_bucket(max(r.ids.shape[1] for r in reqs)),
                self.prompt_cap)
        k = _bucket(len(reqs), minimum=1)
        ids = np.zeros((k, l), np.int32)
        mask = np.zeros((k, l), bool)
        for i, r in enumerate(reqs):
            n = r.ids.shape[1]
            ids[i, :n], mask[i, :n] = r.ids[0], r.mask[0]
        if k > len(reqs):                    # pad rows: repeat row 0
            ids[len(reqs):] = ids[0]
            mask[len(reqs):] = mask[0]
        pixels = []
        for ti in range(len(reqs[0].pixels)):
            rows = [np.asarray(r.pixels[ti])[0] for r in reqs]
            rows += [rows[0]] * (k - len(reqs))
            pixels.append(jnp.asarray(np.stack(rows)))
        if self.negotiate_layouts:
            # negotiation order: the step fixes the param/cache formats,
            # the install fixes the local-cache format, prefill pins both
            self._px_spec = [jax.ShapeDtypeStruct(p.shape, p.dtype)
                             for p in pixels]
            self._step()
            self._install(k)
        local, first, n_valid, prow, last_logits = self._prefill(l, k)(
            self.params, jnp.asarray(ids), jnp.asarray(mask), pixels)
        first = np.asarray(first)
        n_valid = np.asarray(n_valid)
        prow = np.asarray(prow)
        last_logits = np.asarray(last_logits)
        install = self._install(k)
        for i, (req, slot) in enumerate(group):
            self.cache = install(self.cache, local,
                                 jnp.asarray(i, jnp.int32),
                                 jnp.asarray(slot, jnp.int32))
            tok0 = self._first_token(req, int(first[i]), last_logits[i])
            self._slot_req[slot] = req
            self._tok[slot] = tok0
            self._pos[slot] = int(n_valid[i])
            self._t[slot] = 0
            self._prompt_rows[slot] = np.pad(
                prow[i], (0, self.l_out_max - prow.shape[1]))
            self._temp[slot] = req.temperature
            self._topp[slot] = req.top_p
            self._active[slot] = True
            self.admissions += 1
            if self.prefix_cache > 0:
                key = self._prefix_key(req)
                if key not in self._prefix_store:
                    row = self._extract(k)(local, jnp.asarray(i, jnp.int32))
                    self._store_put(key, (
                        row, int(first[i]), last_logits[i].copy(),
                        int(n_valid[i]), self._prompt_rows[slot].copy(),
                        self._valid_ids(req.ids, req.mask),
                        self._pix_key(req)))
            # the prefill already produced the first token
            self._harvest_token(slot, tok0)

    def _admit_cached(self, req: _Request, slot: int) -> None:
        """Prompt-cache hit: splice the stored KV rows into `slot` — no
        tower pass, no prefill, just the donated row install. Sampled
        requests redraw their first token from the STORED prefill logits
        (the prompt state is sampling-agnostic)."""
        row, first, last_logits, n_valid, prow = \
            self._prefix_store[self._prefix_key(req)][:5]
        self._prefix_store.move_to_end(req.key)
        if self.negotiate_layouts:
            self._step()                    # fixes param/cache formats
        self.cache = self._install(1)(self.cache, row,
                                      jnp.asarray(0, jnp.int32),
                                      jnp.asarray(slot, jnp.int32))
        self._slot_req[slot] = req
        self._tok[slot] = self._first_token(req, first, last_logits)
        self._pos[slot] = n_valid
        self._t[slot] = 0
        self._prompt_rows[slot] = prow
        self._temp[slot] = req.temperature
        self._topp[slot] = req.top_p
        self._active[slot] = True
        self.admissions += 1
        self.prefix_hits += 1
        self._harvest_token(slot, int(self._tok[slot]))

    def _admit_partial(self, req: _Request, slot: int, match) -> None:
        """Partial-prefix admission (VERDICT r3 #7): reuse the first `p`
        spliced KV positions of a stored prompt, prefill only the text
        suffix from position p (one bucketed suffix program), install
        into `slot`, and store the COMBINED prompt so exact repeats hit
        fully next time."""
        store_key, p, suffix_ids = match
        entry = self._prefix_store[store_key]
        self._prefix_store.move_to_end(store_key)
        if self.negotiate_layouts:
            self._step()                    # fixes param/cache formats
        s_buck = _bucket(len(suffix_ids), minimum=16)
        ids_suf = np.zeros((1, s_buck), np.int32)
        ids_suf[0, :len(suffix_ids)] = suffix_ids
        suf_mask = np.zeros((1, s_buck), bool)
        suf_mask[0, :len(suffix_ids)] = True
        key_valid = np.zeros((1, self.t_max), bool)
        key_valid[0, :p] = entry[4][:p]     # stored prefix validity
        key_valid[0, p:p + len(suffix_ids)] = True
        row, first, logits = self._suffix_prefill(s_buck)(
            self.params, entry[0], jnp.asarray(ids_suf),
            jnp.asarray(suf_mask), jnp.asarray(p, jnp.int32),
            jnp.asarray(key_valid))
        self.cache = self._install(1)(self.cache, row,
                                      jnp.asarray(0, jnp.int32),
                                      jnp.asarray(slot, jnp.int32))
        n_total = p + len(suffix_ids)
        self._slot_req[slot] = req
        self._tok[slot] = self._first_token(req, int(first[0]), logits[0])
        self._pos[slot] = n_total
        self._t[slot] = 0
        self._prompt_rows[slot] = key_valid[0, :self.l_out_max]
        self._temp[slot] = req.temperature
        self._topp[slot] = req.top_p
        self._active[slot] = True
        self.admissions += 1
        self.partial_hits += 1
        if self.prefix_cache > 0:
            full_key = self._prefix_key(req)
            if full_key not in self._prefix_store:
                self._store_put(full_key, (
                    row, int(first[0]), logits[0].copy(), n_total,
                    key_valid[0, :self.l_out_max].copy(),
                    self._valid_ids(req.ids, req.mask),
                    self._pix_key(req)))
        self._harvest_token(slot, int(self._tok[slot]))

    def _harvest_token(self, slot: int, tok: int) -> None:
        req = self._slot_req[slot]
        if req is None:
            return
        if req.cancelled or tok == self.eos_id \
                or len(req.tokens) >= req.max_new:
            self._finish(slot)
        else:
            req.tokens.append(tok)
            req.stream_q.put(tok)
            self.tokens_out += 1
            if len(req.tokens) >= req.max_new:
                self._finish(slot)

    def _finish(self, slot: int):
        req = self._slot_req[slot]
        self._slot_req[slot] = None
        self._active[slot] = False
        if req is not None:
            self.completions += 1
            req.stream_q.put(None)
            req.event.set()

    def _run(self):
        step = None
        while not self._stop:
            # admission: drain the queue into the free slots, batching
            # same-bucket prompts into one prefill dispatch each
            free = [i for i in range(self.n_slots) if not self._active[i]]
            pending: List[_Request] = []
            hits: List[_Request] = []
            while len(pending) + len(hits) < len(free):
                try:
                    req = self._q.get_nowait()
                except queue.Empty:
                    break
                if req.cancelled:           # hung-up before admission
                    req.stream_q.put(None)
                    req.event.set()
                    continue
                if (self.prefix_cache > 0
                        and self._prefix_key(req) in self._prefix_store):
                    hits.append(req)
                else:
                    pending.append(req)
            partials = []
            if self.prefix_cache > 0 and pending:
                still = []
                for req in pending:
                    m = self._find_partial(req)
                    if m is not None:
                        partials.append((req, m))
                    else:
                        still.append(req)
                pending = still
            admitted = bool(pending) or bool(hits) or bool(partials)
            by_bucket: Dict[int, list] = {}
            for req in pending:
                l = min(_bucket(req.ids.shape[1]), self.prompt_cap)
                by_bucket.setdefault(l, []).append(req)
            it = iter(free)
            for req in hits:
                slot = next(it)
                try:
                    self._admit_cached(req, slot)
                except Exception as e:  # noqa: BLE001 — fail THIS request
                    self._slot_req[slot] = None
                    self._active[slot] = False
                    req.error = e
                    req.stream_q.put(None)
                    req.event.set()
            for req, m in partials:
                slot = next(it)
                try:
                    self._admit_partial(req, slot, m)
                except Exception as e:  # noqa: BLE001 — fail THIS request
                    self._slot_req[slot] = None
                    self._active[slot] = False
                    req.error = e
                    req.stream_q.put(None)
                    req.event.set()
            for reqs in by_bucket.values():
                group = [(r, next(it)) for r in reqs]
                try:
                    self._admit_group(group)
                except Exception as e:  # noqa: BLE001 — fail THIS group
                    for r, slot in group:
                        self._slot_req[slot] = None
                        self._active[slot] = False
                        r.error = e
                        r.stream_q.put(None)
                        r.event.set()
            if not self._active.any():
                if not admitted:
                    try:
                        req = self._q.get(timeout=0.05)
                    except queue.Empty:
                        continue
                    self._q.put(req)     # admit at the top of the loop
                continue
            try:
                if step is None:
                    step = self._step()
                # one chunk for every slot; t is per-slot
                self._rng, kd = jax.random.split(self._rng)
                self.cache, tok, pos, t, toks = step(
                    self.params, self.cache, jnp.asarray(self._tok),
                    jnp.asarray(self._pos), jnp.asarray(self._t),
                    jnp.asarray(self._prompt_rows),
                    jnp.asarray(self._temp), jnp.asarray(self._topp), kd)
            except Exception as e:   # noqa: BLE001 — fail the active slots
                # a dead worker thread would hang every caller; fail the
                # in-flight requests instead and keep serving (the donated
                # cache may be invalid — rebuild it)
                for slot in range(self.n_slots):
                    req = self._slot_req[slot]
                    if req is not None:
                        req.error = e
                        self._slot_req[slot] = None
                        req.stream_q.put(None)
                        req.event.set()
                self._active[:] = False
                self.cache = L.init_cache(self.cfg.decoder, self.n_slots,
                                          self.t_max,
                                          self.precision.compute_dtype,
                                          quant=self.cfg.kv_quant)
                if self._cache_formats is not None:
                    from . import layouts as LY
                    self.cache = LY.relayout(self.cache,
                                             self._cache_formats,
                                             consume=True)
                continue
            self.dispatches += 1
            toks = np.asarray(toks)          # [n_slots, chunk]: pre-step tok
            # writable host copies (np.asarray of a jax array is read-only)
            self._tok = np.array(tok, np.int32)
            self._pos = np.array(pos, np.int32)
            self._t = np.array(t, np.int32)
            # toks[:, 0] is the token each slot held BEFORE the chunk —
            # already harvested at admission (or the previous chunk); the
            # newly produced tokens are toks[:, 1:] + the carried tok
            for slot in range(self.n_slots):
                if not self._active[slot]:
                    continue
                fresh = list(toks[slot, 1:]) + [int(self._tok[slot])]
                for tk in fresh:
                    if not self._active[slot]:
                        break
                    self._harvest_token(slot, int(tk))
