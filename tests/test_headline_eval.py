"""scripts/headline_eval.py smoke: the reference-headline autoencoding
program (train -> ddim encode -> ddim decode -> SSIM/MSE) at tiny
geometry on CPU.  The real chip numbers at ffhq128 geometry live in
PERF.md ("Headline program @128px")."""

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def test_headline_eval_tiny():
    sys.path.insert(0, os.path.join(os.path.dirname(HERE), "scripts"))
    import headline_eval
    out = headline_eval.main([
        "--size", "16", "--platform", "cpu", "--train_steps", "4",
        "--train_batch", "8", "--eval_batch", "8", "--eval_n", "8",
        "--reps", "1", "--styles", "ddim20+ddim10,dpm5+dpm5",
        "--texture", "0.15"])
    assert set(out["styles"]) == {"ddim20+ddim10", "dpm5+dpm5"}
    for style, r in out["styles"].items():
        assert r["imgs_per_sec"] > 0
        # texturing gives every SSIM window real variance, so the
        # constant-patch epsilon artifact (ssim > 1) cannot occur
        assert 0.0 < r["ssim"] <= 1.0
        assert r["mse"] >= 0.0
        assert r["compile_wall_s"] > 0
    # training must have engaged (loss recorded and finite)
    assert out["loss_first"] is not None and out["loss_last"] is not None
