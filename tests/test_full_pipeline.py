"""The complete paper workflow, end to end on tiny models:

for each of 3 vision representations -> stage-1 train (projector) ->
benchmark eval -> A-score embedding dump -> A scores -> SPair feature
extraction -> C scores -> assemble the AC table -> fit the policy.

This is the L0-L6 stack of SURVEY.md §1 in one test (the reference requires
~6 separate manual tools plus code edits to do this)."""

import json
import os

import numpy as np
import pytest
import yaml

from law_of_vision_representation_in_mllms_tpu.core.config import RunConfig

REPS = ["repA", "repB", "repC"]


def _make_training_data(root):
    from PIL import Image
    os.makedirs(f"{root}/imgs", exist_ok=True)
    rng = np.random.RandomState(0)
    records = []
    for i in range(6):
        Image.new("RGB", (40, 30),
                  tuple(int(c) for c in rng.randint(0, 255, 3))).save(
            f"{root}/imgs/t{i}.jpg")
        records.append({
            "image": f"t{i}.jpg",
            "conversations": [
                {"from": "human", "value": "<image>\nwhat is it"},
                {"from": "gpt", "value": f"object number {i}"}]})
    with open(f"{root}/train.json", "w") as f:
        json.dump(records, f)


def _make_benchmark(root):
    from PIL import Image
    os.makedirs(f"{root}/bench", exist_ok=True)
    rng = np.random.RandomState(1)
    docs = []
    for i in range(4):
        Image.new("RGB", (32, 32),
                  tuple(int(c) for c in rng.randint(0, 255, 3))).save(
            f"{root}/bench/b{i}.jpg")
        docs.append({"image": f"b{i}.jpg", "question": f"color {i}?",
                     "options": ["red", "blue"], "answer": "A"})
    with open(f"{root}/bench/q.json", "w") as f:
        json.dump(docs, f)
    cfg = {"task": "tiny_bench", "dataset_path": f"{root}/bench/q.json",
           "dataset_backend": "json", "image_root": f"{root}/bench",
           "output_type": "generate_until",
           "doc_to_text": "mmbench_en.doc_to_text",
           "doc_to_visual": "common.doc_to_visual",
           "process_results": "mmbench_en.process_results",
           "aggregation": "mean",
           "generation_kwargs": {"max_new_tokens": 4}}
    path = f"{root}/bench/task.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


def _run_config(root, rep, stage1_out):
    return RunConfig.from_dict({
        "model": {"vision_tower": "debug/tiny-vit", "decoder": "tiny"},
        "train": {"stage": 1, "batch_size": 2, "epochs": 1, "bf16": False,
                  "max_length": 64, "output_dir": stage1_out,
                  "save_steps": 1000, "seed": hash(rep) % 1000},
        "data": {"data_path": f"{root}/train.json",
                 "image_folder": f"{root}/imgs"},
        "parallel": {"n_data": 1, "n_model": 1},
    })


def test_full_paper_pipeline(tmp_path):
    from law_of_vision_representation_in_mllms_tpu.train.runner import (
        run_training, build_model)
    from law_of_vision_representation_in_mllms_tpu.eval.runner import (
        run_evaluation, run_embed_extraction)
    from law_of_vision_representation_in_mllms_tpu.pipeline import (
        compute_a_scores, run_c_score)
    from law_of_vision_representation_in_mllms_tpu.pipeline.features import (
        extract_tower_features, make_vit_extractor)
    from law_of_vision_representation_in_mllms_tpu.data.image_processing import (
        ImageProcessorConfig)
    from law_of_vision_representation_in_mllms_tpu.policy import (
        fit_policy)
    from law_of_vision_representation_in_mllms_tpu.policy.data import (
        ACTable)
    from tests.test_spair import _make_synthetic_spair
    from PIL import Image
    import jax

    root = str(tmp_path)
    _make_training_data(root)
    task_path = _make_benchmark(root)

    # SPair tree for the C score
    spair = f"{root}/SPair-71k"
    _make_synthetic_spair(spair, n_pairs=3)
    names = {f"img{i}.jpg" for i in range(6)}
    for n in names:
        Image.new("RGB", (64, 48), (30, 60, 90)).save(
            f"{spair}/JPEGImages/cat/{n}")

    bench_scores, a_scores, c_scores = {}, {}, {}
    emb_base = f"{root}/embeds"

    for ri, rep in enumerate(REPS):
        out = f"{root}/{rep}/stage1"
        cfg = _run_config(root, rep, out)
        # 1. stage-1 training (projector only)
        assert run_training(cfg) == 0
        assert os.path.exists(f"{out}/mm_projector.npz")

        # 2. benchmark eval with the stage-1 projector
        cfg.train.pretrain_mm_mlp_adapter = out
        res = run_evaluation(cfg, [task_path])
        bench_scores[rep] = res["tiny_bench"]["value"]

        # 3. A-score embedding dump (first 4 docs)
        n = run_embed_extraction(cfg, task_path,
                                 f"{emb_base}/{rep}", limit=4)
        assert n == 4

        # 4. SPair feature extraction with this rep's tower
        model_cfg, params = build_model(cfg)
        entry = model_cfg.tower_spec.entries[0]
        fn = make_vit_extractor(entry.vit_config, params["towers"][0],
                                select_layer=-2)
        proc = ImageProcessorConfig("clip", size=28, crop=28)
        paths = sorted(f"{spair}/JPEGImages/cat/{n}" for n in names)
        extract_tower_features(fn, paths, proc, f"{root}/{rep}/feats",
                               batch_size=4)
        c = run_c_score(spair, f"{root}/{rep}/feats", suffix="",
                        num_patches=entry.vit_config.grid, anno_size=64,
                        categories=["cat"], compute_geo=False)
        c_scores[rep] = 100 * c["per_img"][0]

    # anchors for the A score: reuse two reps' dumps as clip336/clip224
    os.rename(f"{emb_base}/{REPS[0]}", f"{emb_base}/clip336")
    os.rename(f"{emb_base}/{REPS[1]}", f"{emb_base}/clip224")
    os.rename(f"{emb_base}/{REPS[2]}", f"{emb_base}/{REPS[2]}_t")
    scores = compute_a_scores(emb_base, [f"{REPS[2]}_t", "clip336"],
                              n_images=4)
    a_scores = {REPS[0]: scores["clip336"], REPS[1]: scores["clip336"],
                REPS[2]: scores[f"{REPS[2]}_t"]}
    # the rep identical to an anchor aligns more strongly
    assert a_scores[REPS[0]] >= a_scores[REPS[2]] - 1e-6

    # 5. assemble the AC table + fit the policy (single benchmark, padded
    # to the schema with copies)
    from law_of_vision_representation_in_mllms_tpu.policy.data import (
        BENCHMARKS)
    perf = {b: np.asarray([bench_scores[r] + 0.01 * i
                           for i, r in enumerate(REPS)])
            for b in BENCHMARKS}
    a = {b: np.asarray([a_scores[r] for r in REPS]) for b in BENCHMARKS}
    table = ACTable(models=list(REPS), perf=perf, a=a,
                    c=np.asarray([c_scores[r] for r in REPS]))
    fit = fit_policy(table, "mme")
    assert np.isfinite(fit.r2)
    pred = fit.predict(np.stack(table.normed("mme")[:2], 1))
    assert pred.shape == (3,)
