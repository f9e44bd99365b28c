"""Figure generation on the reference data table (files exist + nonzero)."""

import os

import numpy as np
import pytest

REF_CSV = "/root/reference/policy/ablations_t.csv"


@pytest.mark.skipif(not os.path.exists(REF_CSV),
                    reason="reference table not mounted")
def test_figures_render(tmp_path):
    from law_of_vision_representation_in_mllms_tpu.policy import load_ac_csv
    from law_of_vision_representation_in_mllms_tpu.visualizations import (
        plot_law_scatter, plot_policy_bar, plot_radar, plot_sampling_curve,
        write_ac_score_csv)
    table = load_ac_csv(REF_CSV)
    p1 = plot_law_scatter(table, "mme", str(tmp_path / "law.png"))
    p2 = plot_policy_bar({"Random": 0.4509, "A": 0.7656, "C": 0.5691,
                          "AC": 0.9572}, str(tmp_path / "bar.png"))
    p3 = plot_radar(table, ["CLIP336", "DINOv2", "SD1.5"],
                    str(tmp_path / "radar.png"))
    p4 = plot_sampling_curve([2, 4, 8], [0.5, 0.7, 0.9],
                             str(tmp_path / "curve.png"))
    for p in (p1, p2, p3, p4):
        assert os.path.getsize(p) > 5000

    csv_path = write_ac_score_csv(
        str(tmp_path / "AC_score.csv"), ["m1", "m2"],
        {"m1": {"mme": 0.9}, "m2": {"mme": 0.1}}, {"m1": 15.0, "m2": 3.0})
    assert "corres" in open(csv_path).read()
