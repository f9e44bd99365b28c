"""Single CLI entry point: `lvr <command>`.

Replaces the reference's zoo of shell scripts and edit-in-place drivers
(`scripts/v1_5/train/*.sh`, `scripts/v1_5/feature/*.sh`,
`run_embed_extract.sh`, `A_score/compute.py` constants,
`C_score/extract_feature.py:16-23` edit-me paths, `policy/*.py` argparse).

Commands:
  train             stage-1/2 LLaVA training from a RunConfig YAML
  c-train           supervised correspondence training
  eval              benchmark evaluation (lmms-eval-compatible tasks)
  extract-embeds    A-score embedding dump (first-class, no code edits)
  extract-features  offline per-image tower features
  a-score           compute A scores over dumped embeddings
  c-score           compute C scores (SPair PCK) over cached features
  policy            fit / predict / validate the AC policy
  serve             OpenAI-compatible chat-completions server
  generate          one-shot inference (image + prompt -> answer)
  apply-delta       target = base + delta over .npz param files
  make-delta        delta = target - base over .npz param files
  consolidate       orbax train-state checkpoint -> flat params .npz
"""

from __future__ import annotations

import argparse
import json
import sys


def _add_common(p):
    p.add_argument("--config", help="RunConfig YAML")
    p.add_argument("--set", action="append", default=[],
                   help="override, e.g. --set train.stage=2")


def main(argv=None):
    parser = argparse.ArgumentParser(prog="lvr", description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("train", help="LLaVA stage-1/2 training")
    _add_common(p)

    p = sub.add_parser("eval", help="benchmark evaluation")
    _add_common(p)
    p.add_argument("--tasks", nargs="+", required=True)
    p.add_argument("--limit", type=int)
    p.add_argument("--output", default="eval_results.json")
    p.add_argument("--model", default="llava",
                   help="adapter name (llava | hf-vision2seq | registered)")
    p.add_argument("--model-args", default="",
                   help="k=v,k=v kwargs for non-llava adapters")
    p.add_argument("--log-samples", action="store_true",
                   help="write per-doc records next to --output "
                        "(lmms-eval --log_samples)")

    p = sub.add_parser("tasks", help="list bundled eval tasks")

    p = sub.add_parser("merge-results",
                       help="merge per-process sample logs into one "
                            "aggregated result (multi-host eval gather)")
    p.add_argument("--task", required=True,
                   help="task yaml path or bundled task name")
    p.add_argument("--samples", nargs="+", required=True,
                   help="per-process *_samples.jsonl files")
    p.add_argument("--output", default="merged_results.json")

    p = sub.add_parser("serve", help="OpenAI-compatible model server")
    _add_common(p)
    p.add_argument("--model", default="llava",
                   help="adapter name (llava | registered)")
    p.add_argument("--model-args", default="")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max-batch", type=int, default=8,
                   help="dynamic-batching max requests per dispatch")
    p.add_argument("--batch-window-ms", type=float, default=5.0,
                   help="coalescing window after the first request")
    p.add_argument("--gen-backend",
                   choices=["greedy", "chunked", "speculative"],
                   help="decode backend for the llava model (shorthand "
                        "for --set model.gen_backend=...; all three are "
                        "greedy-equivalent)")
    p.add_argument("--inflight", action="store_true",
                   help="continuous batching: requests join/leave a "
                        "running slot pool between decode chunks "
                        "(models/inflight.py; llava adapter only)")
    p.add_argument("--slots", type=int, default=4,
                   help="--inflight: concurrent decode slots")
    p.add_argument("--prompt-cap", type=int, default=256,
                   help="--inflight: max prompt tokens per request")
    p.add_argument("--gen-cap", type=int, default=256,
                   help="--inflight: max generated tokens per request")
    p.add_argument("--decode-chunk-serve", type=int, default=4,
                   help="--inflight: decode steps per dispatch (admission "
                        "latency <= one chunk)")
    p.add_argument("--prefix-cache", type=int, default=0,
                   help="--inflight: prompt-KV LRU entries (repeat "
                        "prompts skip tower+prefill entirely; 0 = off)")
    p.add_argument("--prefix-block", type=int, default=64,
                   help="--prefix-cache: partial-prefix reuse granularity "
                        "in spliced KV positions (shared system prompts "
                        "prefill only their text suffix)")
    p.add_argument("--prefix-cache-mb", type=int, default=0,
                   help="--prefix-cache: byte budget for the prompt-KV "
                        "store in MB (0 = entry-count bound only). At 7B "
                        "one stored prompt row is ~800 MB bf16 / ~400 MB "
                        "with model.kv_quant=int8 — bound by bytes, not "
                        "entries, when serving large models")

    p = sub.add_parser("sam-masks",
                       help="GeoAware foreground masks via box-prompted "
                            "SAM (preprocess_mask_sam.py equivalent)")
    p.add_argument("--snapshot", required=True,
                   help="local HF facebook/sam-vit-{base,large,huge} "
                        "snapshot dir")
    p.add_argument("--images", required=True,
                   help="JPEGImages root (ImageAnnotation sibling "
                        "holds the bbox jsons)")
    p.add_argument("--anno-size", type=int, default=960)
    p.add_argument("--spair", action="store_true",
                   help="annotations use SPair 'bndbox' corners")
    p.add_argument("--limit", type=int)

    p = sub.add_parser("generate",
                       help="one-shot inference: image + prompt -> answer "
                            "(run_llava.py equivalent)")
    _add_common(p)
    p.add_argument("--image", help="image path (omit for text-only)")
    p.add_argument("--prompt", required=True)
    p.add_argument("--max-new-tokens", type=int, default=128)
    p.add_argument("--gen-backend",
                   choices=["greedy", "chunked", "speculative"])
    p.add_argument("--temperature", type=float, default=0.0,
                   help="temperature > 0 samples (run_llava.py:81-83 "
                        "decodes at 0.2/0.7 by default); 0 = greedy")
    p.add_argument("--top-p", type=float, default=1.0,
                   help="nucleus sampling mass (with --temperature > 0)")

    p = sub.add_parser("apply-delta",
                       help="target = base + delta over .npz param files")
    p.add_argument("--base", required=True)
    p.add_argument("--delta", required=True)
    p.add_argument("--target", required=True)

    p = sub.add_parser("make-delta",
                       help="delta = target - base over .npz param files")
    p.add_argument("--base", required=True)
    p.add_argument("--target", required=True)
    p.add_argument("--delta", required=True)

    p = sub.add_parser("consolidate",
                       help="orbax train-state checkpoint -> flat .npz")
    p.add_argument("--checkpoint", required=True,
                   help="checkpoint-N dir (or run dir; newest is used)")
    p.add_argument("--output", required=True)

    p = sub.add_parser("extract-embeds", help="A-score embedding dump")
    _add_common(p)
    p.add_argument("--task", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--limit", type=int, default=100)

    p = sub.add_parser("extract-features", help="offline feature dump")
    _add_common(p)
    p.add_argument("--images", required=True,
                   help="directory or json list of image paths")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--suffix", default="")

    p = sub.add_parser("a-score")
    p.add_argument("--base-folder", required=True)
    p.add_argument("--reps", nargs="+", required=True)
    p.add_argument("--n-images", type=int, default=100)

    p = sub.add_parser("c-score")
    p.add_argument("--spair-dir", required=True,
                   help="dataset root (SPair-71k / AP-10k / PF-Pascal)")
    p.add_argument("--feature-dir", required=True)
    p.add_argument("--num-patches", type=int, required=True)
    p.add_argument("--suffix", default="")
    p.add_argument("--suffix2", help="two-feature concat variant")
    p.add_argument("--anno-size", type=int, default=840)
    p.add_argument("--window", type=int, default=5)
    p.add_argument("--categories", nargs="*")
    p.add_argument("--subsample", type=int)
    p.add_argument("--dataset", default="spair",
                   choices=["spair", "ap10k", "pascal"])

    p = sub.add_parser("c-train", help="supervised correspondence training")
    p.add_argument("--spair-dir", required=True)
    p.add_argument("--feature-dir", required=True)
    p.add_argument("--feature-dims", nargs="+", type=int, required=True)
    p.add_argument("--num-patches", type=int, required=True)
    p.add_argument("--anno-size", type=int, default=840)
    p.add_argument("--suffix", default="")
    p.add_argument("--categories", nargs="*")
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--out-dir", default="c_train_out")

    p = sub.add_parser("make-config",
                       help="emit a RunConfig YAML for one of the paper's "
                            "13 representations")
    p.add_argument("rep", help="e.g. CLIP336, SD1.5, CLIP336+DINOv2; "
                               "'list' prints all")
    p.add_argument("--stage", type=int, default=1, choices=[1, 2])
    p.add_argument("--tokenizer", default="/ckpts/vicuna-7b-v1.5")
    p.add_argument("--output-dir")
    p.add_argument("--data-path", default="")
    p.add_argument("--image-folder", default="")
    p.add_argument("--n-data", type=int, default=8)
    p.add_argument("--n-model", type=int, default=1)
    p.add_argument("--zero", type=int, default=2)
    p.add_argument("--lora", action="store_true",
                   help="finetune_lora.sh variant (r=128, alpha=256)")
    p.add_argument("--qlora", choices=["int4", "int8"],
                   help="LoRA + quantized frozen decoder base (QLoRA)")

    p = sub.add_parser("port-featurizer",
                       help="diffusers snapshot dir -> featurizer bundle")
    p.add_argument("kind",
                   choices=["sd15", "sd21", "imsd", "sdxl", "dit", "sd3"])
    p.add_argument("src_root", help="snapshot with unet/ vae/ text_encoder*/")
    p.add_argument("out_path")
    p.add_argument("--t", type=int, default=1)
    p.add_argument("--up-ft-index", type=int)
    p.add_argument("--ensemble-size", type=int, default=1)
    p.add_argument("--img-size", type=int)

    p = sub.add_parser("preprocess-map",
                       help="GeoAware-SC SD+DINO feature pre-extraction "
                            "(C_score/preprocess_map.py)")
    p.add_argument("images", help="image dir or JSON list of paths")
    p.add_argument("out_dir")
    p.add_argument("--sd-bundle", required=True,
                   help="ported SD featurizer bundle (lvr port-featurizer)")
    p.add_argument("--dino-bundle", required=True,
                   help="ported DINOv2 params npz")
    p.add_argument("--dino-tower", default="facebook/dinov2-base-840")
    p.add_argument("--real-size", type=int, default=960)
    p.add_argument("--dino-size", type=int, default=840)
    p.add_argument("--layer", type=int, default=11)
    p.add_argument("--facet", default="token",
                   choices=["token", "key", "query", "value"])
    p.add_argument("--ensemble", type=int, default=1)
    p.add_argument("--stochastic", action="store_true",
                   help="sample VAE posterior + noise (reference behaviour);"
                        " default is the deterministic cache-stable path")
    p.add_argument("--no-flips", action="store_true")

    p = sub.add_parser("pose-awareness",
                       help="GeoAware-SC pose-awareness test "
                            "(C_score/pose_awareness_test.py)")
    p.add_argument("template_dir", help="12 sorted pose-template images")
    p.add_argument("target_dir")
    p.add_argument("labels", help="JSON {filename: b|f|l|r}")
    p.add_argument("feat_dir", help="preprocess-map output dir")
    p.add_argument("--mask-dir", help="per-image <stem>_mask.npy|png")
    p.add_argument("--res", type=int, default=128)
    p.add_argument("--output")

    p = sub.add_parser("policy")
    p.add_argument("action", choices=["fit", "predict", "validate"])
    p.add_argument("--csv", required=True)
    p.add_argument("--benchmark")
    p.add_argument("--data", default="AC",
                   choices=["AC", "A", "C", "random", "Ar"])
    p.add_argument("--model", default="polynomial",
                   choices=["polynomial", "linear"])
    p.add_argument("--train-models", nargs="*")
    p.add_argument("--top", type=int, default=1)

    args = parser.parse_args(argv)
    # LVR_PLATFORM=cpu forces the JAX backend (the JAX_PLATFORMS env var
    # is swallowed by this environment's site hook — CLAUDE.md); used by
    # CPU smoke tests of TPU-targeted pipelines
    import os as _os0
    if _os0.environ.get("LVR_PLATFORM"):
        import jax as _jax
        _jax.config.update("jax_platforms", _os0.environ["LVR_PLATFORM"])
    # multi-host launch (TPU pod / multi-process): LVR_DISTRIBUTED=1
    # initializes the jax runtime before any backend use — the
    # deepspeed-launcher / init_process_group step of the reference
    import os as _os
    if _os.environ.get("LVR_DISTRIBUTED"):
        from .parallel.mesh import init_distributed
        init_distributed(
            coordinator_address=_os.environ.get("LVR_COORDINATOR"),
            num_processes=int(_os.environ["LVR_NUM_PROCESSES"])
            if _os.environ.get("LVR_NUM_PROCESSES") else None,
            process_id=int(_os.environ["LVR_PROCESS_ID"])
            if _os.environ.get("LVR_PROCESS_ID") else None)
    return DISPATCH[args.cmd](args)


# ---------------------------------------------------------------------------

def _cmd_a_score(args):
    from .pipeline import compute_a_scores
    scores = compute_a_scores(args.base_folder, args.reps,
                              n_images=args.n_images)
    print(json.dumps(scores, indent=1))
    return 0


def _cmd_c_score(args):
    from .pipeline import run_c_score
    res = run_c_score(args.spair_dir, args.feature_dir, suffix=args.suffix,
                      suffix2=args.suffix2, num_patches=args.num_patches,
                      anno_size=args.anno_size, window=args.window,
                      categories=args.categories or None,
                      subsample=args.subsample, dataset=args.dataset)
    out = {"per_img_pck": res["per_img"], "per_kpt_pck": res["per_kpt"]}
    if "geo" in res:
        out["geo_pck"] = res["geo"]
    print(json.dumps(out, indent=1))
    return 0


def _cmd_policy(args):
    from .policy import (load_ac_csv, fit_policy, validate_run, BENCHMARKS,
                         prediction_accuracy, ALL_MODELS)
    table = load_ac_csv(args.csv)
    if args.action == "fit":
        for b in ([args.benchmark] if args.benchmark else BENCHMARKS):
            fit = fit_policy(table, b, data=args.data, model=args.model)
            print(f"{b}: r2={fit.r2:.4f} mse={fit.mse:.5f}")
    elif args.action == "validate":
        ok, top = validate_run(table, args.benchmark,
                               args.train_models or ALL_MODELS,
                               top=args.top)
        print(json.dumps({"hit": bool(ok), "top": list(top)}))
    else:
        for k in (4, 8, 12):
            acc = prediction_accuracy(table, k=k, data=args.data,
                                      model=args.model, top=args.top)
            print(f"k={k}: accuracy={acc:.4f}")
    return 0


def _cmd_train(args):
    from .core.config import RunConfig
    from .train.runner import run_training
    cfg = RunConfig.from_yaml(args.config, args.set)
    return run_training(cfg)


def _parse_model_args(spec: str) -> dict:
    """k=v,k=v adapter kwargs with bool/int/float coercion (lmms-eval's
    simple_parse_args_string semantics)."""
    margs = {}
    for kv in filter(None, spec.split(",")):
        if "=" not in kv:
            raise SystemExit(f"--model-args entry '{kv}' is not k=v")
        k, v = kv.split("=", 1)
        if v.lower() in ("true", "false"):
            v = v.lower() == "true"
        else:
            for cast in (int, float):
                try:
                    v = cast(v)
                    break
                except ValueError:
                    pass
        margs[k] = v
    return margs


def _cmd_eval(args):
    from .core.config import RunConfig
    from .eval.runner import run_evaluation
    cfg = RunConfig.from_yaml(args.config, args.set) if args.config \
        else RunConfig.from_dict({})
    margs = _parse_model_args(args.model_args)
    res = run_evaluation(cfg, args.tasks, limit=args.limit,
                         model=args.model, model_args=margs or None,
                         log_samples=args.log_samples)
    with open(args.output, "w") as f:
        json.dump({k: {kk: vv for kk, vv in v.items() if kk != "samples"}
                   for k, v in res.items()}, f, indent=1)
    if args.log_samples:
        import os as _os
        base, _ = _os.path.splitext(args.output)
        for task, v in res.items():
            with open(f"{base}_{task}_samples.jsonl", "w") as f:
                for rec in v.get("samples") or []:
                    f.write(json.dumps(rec) + "\n")
    print(json.dumps({k: v["value"] for k, v in res.items()}, indent=1))
    return 0


def _cmd_extract_embeds(args):
    from .core.config import RunConfig
    from .eval.runner import run_embed_extraction
    cfg = RunConfig.from_yaml(args.config, args.set) if args.config \
        else RunConfig.from_dict({})
    n = run_embed_extraction(cfg, args.task, args.out_dir, limit=args.limit)
    print(f"dumped {n} embeddings to {args.out_dir}")
    return 0


def _cmd_extract_features(args):
    from .pipeline.runner import run_feature_extraction
    from .core.config import RunConfig
    cfg = RunConfig.from_yaml(args.config, args.set) if args.config \
        else RunConfig.from_dict({})
    n = run_feature_extraction(cfg, args.images, args.out_dir,
                               batch_size=args.batch_size,
                               suffix=args.suffix)
    print(f"extracted {n} feature files to {args.out_dir}")
    return 0


def _cmd_c_train(args):
    from .train.c_score_runner import run_c_training
    res = run_c_training(args.spair_dir, args.feature_dir,
                         feature_dims=args.feature_dims,
                         num_patches=args.num_patches,
                         anno_size=args.anno_size, suffix=args.suffix,
                         categories=args.categories or None,
                         steps=args.steps, out_dir=args.out_dir)
    print(json.dumps({"best_pck": res["best_pck"],
                      "history": res["history"][-3:]}))
    return 0


def _cmd_make_config(args):
    from .core.representations import REPRESENTATIONS, render_config
    if args.rep == "list":
        for name, rep in REPRESENTATIONS.items():
            print(f"{name}\t{rep.tower}")
        return 0
    print(render_config(args.rep, args.stage, tokenizer=args.tokenizer,
                        output_dir=args.output_dir,
                        data_path=args.data_path,
                        image_folder=args.image_folder,
                        n_data=args.n_data, n_model=args.n_model,
                        zero=args.zero, lora=args.lora,
                        qlora=args.qlora))
    return 0


def _cmd_preprocess_map(args):
    import glob as _glob
    import os as _os
    import jax
    from .io.featurizer_bundle import load_featurizer_bundle
    from .pipeline.geoware import make_geoware_extractors, preprocess_maps
    sd_params, sd_cfg = load_featurizer_bundle(args.sd_bundle)
    if sd_cfg is None:
        raise SystemExit("--sd-bundle has no featurizer config sidecar")
    import dataclasses
    sd_cfg = dataclasses.replace(sd_cfg, img_size=args.real_size)
    dino_params, _ = load_featurizer_bundle(args.dino_bundle)
    sd_fn, dino_fn = make_geoware_extractors(
        sd_params, sd_cfg, dino_params, args.dino_tower,
        layer=args.layer, facet=args.facet,
        deterministic=not args.stochastic, ensemble=args.ensemble)
    if _os.path.isdir(args.images):
        paths = sorted(p for ext in ("jpg", "jpeg", "png") for p in
                       _glob.glob(f"{args.images}/**/*.{ext}",
                                  recursive=True))
    else:
        with open(args.images) as f:
            paths = json.load(f)
    written = preprocess_maps(
        paths, args.out_dir, sd_fn, dino_fn, real_size=args.real_size,
        dino_size=args.dino_size, flips=not args.no_flips,
        process_index=jax.process_index(),
        process_count=jax.process_count())
    print(f"wrote {len(written)} feature files -> {args.out_dir}")
    return 0


def _cmd_pose_awareness(args):
    from .pipeline.geoware import run_pose_awareness
    results = run_pose_awareness(
        args.template_dir, args.target_dir, args.labels, args.feat_dir,
        mask_dir=args.mask_dir, res=args.res, out_path=args.output)
    print(json.dumps(results, indent=1))
    return 0


def _cmd_port_featurizer(args):
    from .io.featurizer_bundle import port_featurizer_bundle
    out = port_featurizer_bundle(
        args.kind, args.src_root, args.out_path, t=args.t,
        up_ft_index=args.up_ft_index, ensemble_size=args.ensemble_size,
        img_size=args.img_size)
    print(f"ported {args.kind} bundle -> {out}")
    return 0


def _cmd_tasks(args):
    import glob
    import os as _os
    from .eval.tasks import TASK_DIR
    for path in sorted(glob.glob(_os.path.join(TASK_DIR, "*.yaml"))):
        name = _os.path.splitext(_os.path.basename(path))[0]
        desc = ""
        with open(path) as f:
            first = f.readline().strip()
            if first.startswith("#"):
                desc = first.lstrip("# ")
        print(f"{name:28s} {desc}")
    return 0


def _cmd_merge_results(args):
    """Host-side gather for doc-sharded multi-process eval: each process
    runs `lvr eval --log-samples` over its `jax.process_index()` shard;
    this re-aggregates the union of their sample logs (the reference
    gathers rank results with accelerate, `evaluator.py` tail)."""
    import yaml as pyyaml
    from .eval.evaluator import aggregate_records
    from .eval.tasks import task_yaml
    import os as _os

    path = args.task if _os.path.exists(args.task) else task_yaml(args.task)
    with open(path) as f:
        cfg = pyyaml.safe_load(f)
    name = cfg["task"]
    recs = []
    for fp in args.samples:
        with open(fp) as f:
            recs.extend(json.loads(line) for line in f if line.strip())
    seen = set()
    for r in recs:
        did = r.get("doc_id")
        if did in seen:
            raise SystemExit(
                f"doc_id {did} appears in more than one shard — "
                "the per-process runs overlapped")
        seen.add(did)
    out = {name: aggregate_records(recs, cfg.get("aggregation", "mean"))}
    with open(args.output, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    return 0


def _cmd_sam_masks(args):
    """`C_score/preprocess_mask_sam.py` as a CLI over the TPU-native SAM:
    the HF snapshot is ported in-memory (host-side torch load), then each
    image's annotation box prompts one jitted segment call."""
    import jax.numpy as jnp
    import jax
    from transformers import SamConfig as HFSamConfig
    from .io.hf_port import port_sam, sam_config_from_hf
    from .io.port_cli import load_torch_state_dict
    from .pipeline.sam_masks import run_sam_masks
    hf_cfg = HFSamConfig.from_pretrained(args.snapshot)
    cfg = sam_config_from_hf(hf_cfg)
    sd = load_torch_state_dict(args.snapshot)
    params = jax.tree.map(jnp.asarray, port_sam(sd, cfg))
    n = run_sam_masks(params, cfg, args.images, anno_size=args.anno_size,
                      spair=args.spair, limit=args.limit)
    print(f"wrote masks for {n} images", file=sys.stderr)
    return 0


def _cmd_generate(args):
    """One-shot inference (`llava/eval/run_llava.py:1-100` eval_model):
    template-rendered prompt + one image through the production adapter;
    the answer prints to stdout."""
    from .core.config import RunConfig
    from .eval.api import Instance
    from .eval.runner import build_lmm
    cfg = RunConfig.from_yaml(args.config, args.set) if args.config \
        else RunConfig.from_dict({}, args.set)
    if getattr(args, "gen_backend", None):
        cfg.model.gen_backend = args.gen_backend
    lmm = build_lmm(cfg)
    visual = []
    if args.image:
        from PIL import Image
        visual = [Image.open(args.image).convert("RGB")]
    inst = Instance("generate_until", {}, 0, "cli",
                    (args.prompt,
                     {"max_new_tokens": args.max_new_tokens,
                      "temperature": args.temperature,
                      "top_p": args.top_p}), visual)
    print(lmm.generate_until([inst])[0])
    return 0


def _cmd_apply_delta(args):
    from .io.delta import apply_delta
    n = apply_delta(args.base, args.delta, args.target)
    print(f"wrote {args.target} ({n} arrays)", file=sys.stderr)
    return 0


def _cmd_make_delta(args):
    from .io.delta import make_delta
    n = make_delta(args.base, args.target, args.delta)
    print(f"wrote {args.delta} ({n} arrays)", file=sys.stderr)
    return 0


def _cmd_consolidate(args):
    from .io.checkpoint import latest_checkpoint
    from .io.delta import consolidate
    path = args.checkpoint
    latest = latest_checkpoint(path)
    if latest:
        path = latest
    n = consolidate(path, args.output)
    print(f"wrote {args.output} ({n} arrays)", file=sys.stderr)
    return 0


def _cmd_serve(args):
    from .core.config import RunConfig
    from .serve import run_server
    cfg = RunConfig.from_yaml(args.config, args.set) if args.config \
        else RunConfig.from_dict({})
    if getattr(args, "gen_backend", None):
        cfg.model.gen_backend = args.gen_backend
    margs = _parse_model_args(args.model_args)
    srv = run_server(cfg, model=args.model, model_args=margs or None,
                     host=args.host, port=args.port,
                     max_batch=args.max_batch,
                     batch_window_ms=args.batch_window_ms,
                     inflight=args.inflight,
                     inflight_kwargs={
                         "n_slots": args.slots,
                         "prompt_cap": args.prompt_cap,
                         "gen_cap": args.gen_cap,
                         "chunk": args.decode_chunk_serve,
                         "prefix_cache": args.prefix_cache,
                         "prefix_block": args.prefix_block,
                         "prefix_cache_bytes":
                             args.prefix_cache_mb * (1 << 20),
                     } if args.inflight else None)
    print(f"serving {args.model} on http://{args.host}:{srv.port}/v1",
          file=sys.stderr)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        print("shutting down", file=sys.stderr)
        srv.shutdown()
    return 0


DISPATCH = {
    "a-score": _cmd_a_score,
    "port-featurizer": _cmd_port_featurizer,
    "make-config": _cmd_make_config,
    "c-score": _cmd_c_score,
    "policy": _cmd_policy,
    "train": _cmd_train,
    "eval": _cmd_eval,
    "serve": _cmd_serve,
    "generate": _cmd_generate,
    "sam-masks": _cmd_sam_masks,
    "apply-delta": _cmd_apply_delta,
    "make-delta": _cmd_make_delta,
    "consolidate": _cmd_consolidate,
    "tasks": _cmd_tasks,
    "merge-results": _cmd_merge_results,
    "extract-embeds": _cmd_extract_embeds,
    "extract-features": _cmd_extract_features,
    "c-train": _cmd_c_train,
    "preprocess-map": _cmd_preprocess_map,
    "pose-awareness": _cmd_pose_awareness,
}


if __name__ == "__main__":
    sys.exit(main())
