"""Multi-epoch end-to-end behavioral A/B vs the ACTUAL reference (VERDICT r2
next #1): the reference's own train_epoch/valid (imported from
/root/reference/main.py, torch CPU) and this framework, identical data +
identical init, per-epoch loss/accuracy trajectories compared across every
training regime. See tests/ab_harness.py; the measured trajectory table is
recorded in BASELINE.md ("Round-3 end-to-end behavioral A/B").

Tolerances: step-level parity is ~2e-7 (harness smoke); over several epochs
fp drift is amplified chaotically by from-scratch training (BN invstd on
near-dead channels is the dominant multiplier — measured 1e-6 -> 1e-3/step),
so epoch-0 means match to ~1e-2 and later epochs to ~1e-1. Accuracy on the
16-sample test split is quantized to 1/16 and compared loosely; eval-path
parity itself is pinned EXACTLY by the eval-at-init check (identical params
-> identical accuracy). OGM_GE injects Gaussian noise drawn from different
RNGs on each side, hence its looser band.
"""

import os

import pytest

from ab_harness import load_reference, run_ab, tiny_ref_m3ae, trajectory_diffs

REGIMES = {
    # regime: (max |Δloss| epoch 0, max |Δloss| any epoch, final |Δacc|)
    "Normal": (0.06, 0.25, 0.25),
    "OGM": (0.06, 0.25, 0.25),
    "OGM_GE": (0.12, 0.40, 0.30),   # per-side GE noise
    "QMF": (0.06, 0.25, 0.25),
    "MLA": (0.06, 0.25, 0.25),
    "MLA_dynamic": (0.06, 0.25, 0.25),
}


@pytest.mark.slow
@pytest.mark.parametrize("regime", list(REGIMES))
def test_reference_ab_trajectory(regime, tmp_path):
    e0_tol, loss_tol, acc_tol = REGIMES[regime]
    ref, ours, ref_init, our_init = run_ab(
        regime, str(tmp_path / "d"), str(tmp_path), epochs=3)

    # eval-path parity at bit-identical params: exact
    for k in ("acc", "acc_a", "acc_v"):
        assert abs(ref_init[k] - our_init[k]) < 1e-9, (k, ref_init, our_init)

    # loss trajectories track the reference's
    for k in ("loss", "loss_a", "loss_v"):
        assert abs(ref[0][k] - ours[0][k]) <= e0_tol, (k, ref[0], ours[0])
    dl, _ = trajectory_diffs(ref, ours)
    assert dl <= loss_tol, (dl, ref, ours)

    # both sides actually train, equivalently
    assert ref[-1]["loss"] < 0.5 * ref[0]["loss"], ref
    assert ours[-1]["loss"] < 0.5 * ours[0]["loss"], ours
    assert abs(ref[-1]["acc"] - ours[-1]["acc"]) <= acc_tol, (ref[-1], ours[-1])


@pytest.mark.slow
@pytest.mark.parametrize("regime", ["MLA", "QMF"])
def test_reference_ab_trajectory_second_point(regime, tmp_path):
    """VERDICT r3 #8: a second (seed, size) point for the CNN family — the
    converged-accuracy-equality claim shouldn't rest on one 48-clip run.
    Seed 11, 96/32 clips (2x the base run, acc quantized to 1/32)."""
    ref, ours, ref_init, our_init = run_ab(
        regime, str(tmp_path / "d"), str(tmp_path), epochs=3,
        n_train=96, n_test=32, seed=11)
    for k in ("acc", "acc_a", "acc_v"):
        assert abs(ref_init[k] - our_init[k]) < 1e-9, (k, ref_init, our_init)
    for k in ("loss", "loss_a", "loss_v"):
        assert abs(ref[0][k] - ours[0][k]) <= 0.06, (k, ref[0], ours[0])
    dl, _ = trajectory_diffs(ref, ours)
    assert dl <= 0.25, (dl, ref, ours)
    assert ref[-1]["loss"] < 0.5 * ref[0]["loss"], ref
    assert ours[-1]["loss"] < 0.5 * ours[0]["loss"], ours
    assert abs(ref[-1]["acc"] - ours[-1]["acc"]) <= 0.25, (ref[-1], ours[-1])


@pytest.mark.slow
@pytest.mark.parametrize("regime", ["Normal", "MLA"])
def test_reference_ab_trajectory_third_point(regime, tmp_path):
    """VERDICT r4 #8: a third (seed, size) point — seed 23, 64/32 clips.
    Measured (BASELINE.md third-point table): scatter direction flips per
    point and regime (Normal ours+6/ref+6/ours+2, MLA 0/0/ref+10 of 32),
    so the band is on loss tracking + convergence, with accuracy inside
    the three-point scatter envelope (<=0.35 = 11/32)."""
    ref, ours, ref_init, our_init = run_ab(
        regime, str(tmp_path / "d"), str(tmp_path), epochs=3,
        n_train=64, n_test=32, seed=23)
    for k in ("acc", "acc_a", "acc_v"):
        assert abs(ref_init[k] - our_init[k]) < 1e-9, (k, ref_init, our_init)
    for k in ("loss", "loss_a", "loss_v"):
        assert abs(ref[0][k] - ours[0][k]) <= 0.06, (k, ref[0], ours[0])
    dl, _ = trajectory_diffs(ref, ours)
    assert dl <= 0.25, (dl, ref, ours)
    assert ref[-1]["loss"] < 0.5 * ref[0]["loss"], ref
    assert ours[-1]["loss"] < 0.5 * ours[0]["loss"], ours
    assert abs(ref[-1]["acc"] - ours[-1]["acc"]) <= 0.35, (ref[-1], ours[-1])


M3AE_REGIMES = {
    # transformer trajectories drift less than the BN-heavy CNN ones (no
    # invstd amplifier); bands set ~4x above measured drift
    "Normal": (0.02, 0.10, 0.25),
    # OGM is a no-op for 2-modal m3ae: the coefficient filter matches
    # 'audio'/'visual' param-name substrings, and mae_*/fusion params carry
    # neither — measured trajectory == Normal EXACTLY on both sides
    "OGM": (0.02, 0.10, 0.25),
    "QMF": (0.02, 0.10, 0.25),
    "MLA": (0.02, 0.10, 0.25),
    "MLA_dynamic": (0.02, 0.10, 0.25),   # entropy-gated fused eval
}


@pytest.mark.slow
@pytest.mark.parametrize("regime", list(M3AE_REGIMES))
def test_reference_ab_trajectory_m3ae(regime, tmp_path):
    """The transformer family A/B: MVSA image-text, depth-1 768-wide
    encoders both sides (see ab_harness.tiny_ref_m3ae), reference's own
    train_epoch/valid m3ae branch (main.py:153-157) vs our jitted steps."""
    e0_tol, loss_tol, acc_tol = M3AE_REGIMES[regime]
    ref, ours, ref_init, our_init = run_ab(
        regime, str(tmp_path / "d"), str(tmp_path), epochs=2, lorb="m3ae")

    for k in ("acc", "acc_a", "acc_v"):
        assert abs(ref_init[k] - our_init[k]) < 1e-9, (k, ref_init, our_init)

    for k in ("loss", "loss_a", "loss_v"):
        assert abs(ref[0][k] - ours[0][k]) <= e0_tol, (k, ref[0], ours[0])
    dl, _ = trajectory_diffs(ref, ours)
    assert dl <= loss_tol, (dl, ref, ours)
    assert abs(ref[-1]["acc"] - ours[-1]["acc"]) <= acc_tol, (ref[-1], ours[-1])


MODAL3_REGIMES = {
    "Normal": (0.02, 0.10, 0.25),
    "OGM": (0.02, 0.10, 0.25),
    "QMF": (0.02, 0.10, 0.25),
    "MLA": (0.02, 0.10, 0.25),
    "MLA_dynamic": (0.02, 0.10, 0.25),   # calculate_gating_weights3 eval
}


@pytest.mark.slow
@pytest.mark.parametrize("regime", list(MODAL3_REGIMES))
def test_reference_ab_trajectory_modal3(regime, tmp_path):
    """The 3-modality family A/B: IEMOCAP audio+image+text, tiny CAV-MAE
    audio branch (ab_harness.CAV_TINY) + depth-1 M3AE image/text, the
    reference's own modal3 branches (main.py:145-151 unpack, 3-History QMF,
    3-way OGM/eval) vs our jitted steps."""
    e0_tol, loss_tol, acc_tol = MODAL3_REGIMES[regime]
    ref, ours, ref_init, our_init = run_ab(
        regime, str(tmp_path / "d"), str(tmp_path), epochs=2, modal3=True)

    for k in ("acc", "acc_a", "acc_v", "acc_t"):
        assert abs(ref_init[k] - our_init[k]) < 1e-9, (k, ref_init, our_init)

    for k in ("loss", "loss_a", "loss_v", "loss_t"):
        assert abs(ref[0][k] - ours[0][k]) <= e0_tol, (k, ref[0], ours[0])
    dl, _ = trajectory_diffs(ref, ours)
    assert dl <= loss_tol, (dl, ref, ours)
    assert abs(ref[-1]["acc"] - ours[-1]["acc"]) <= acc_tol, (ref[-1], ours[-1])


FAMILY_CASES = [
    # (family, regime): the remaining two classifier families, completing
    # all five (base CNN, m3ae, modal3, large CAV, clip) through the A/B
    ("large", "Normal"), ("large", "OGM"), ("large", "MLA"),
    ("clip", "Normal"), ("clip", "MLA"),
]


@pytest.mark.slow
@pytest.mark.parametrize("family,regime", FAMILY_CASES)
def test_reference_ab_trajectory_family(family, regime, tmp_path):
    """large = CREMA-D 2x tiny CAV-MAE (the reference's own CAVDataset is
    unrunnable — returns a 3-tuple where main.py:159 unpacks 4 — so the A/B
    feeds captured batches directly); clip = Food-101 precomputed features
    (basic_model.py:278-319)."""
    ref, ours, ref_init, our_init = run_ab(
        regime, str(tmp_path / "d"), str(tmp_path), epochs=2,
        lorb="large" if family == "large" else "base",
        clip=family == "clip")

    for k in ("acc", "acc_a", "acc_v"):
        assert abs(ref_init[k] - our_init[k]) < 1e-9, (k, ref_init, our_init)

    for k in ("loss", "loss_a", "loss_v"):
        assert abs(ref[0][k] - ours[0][k]) <= 0.02, (k, ref[0], ours[0])
    dl, _ = trajectory_diffs(ref, ours)
    assert dl <= 0.10, (dl, ref, ours)
    assert abs(ref[-1]["acc"] - ours[-1]["acc"]) <= 0.25, (ref[-1], ours[-1])


@pytest.mark.slow
def test_reference_large_qmf_crashes_as_shipped(tmp_path):
    """Pins PARITY divergence #4's crash claim: the reference routes
    large+QMF past the QMF forward (branch order, main.py:166-170) but then
    never assigns ``loss``/``out_a`` (main.py:290-294), so train_epoch dies
    with UnboundLocalError on the first batch. Our joint-path dispatch is
    the repair, not a silent behavior change."""
    with pytest.raises(NameError):      # UnboundLocalError subclasses it
        run_ab("QMF", str(tmp_path / "d"), str(tmp_path), epochs=1,
               lorb="large")


@pytest.mark.slow
def test_reference_m3ae_droppath_crashes_as_shipped():
    """Pins the divergence note in tiny_ref_m3ae: the as-shipped reference
    m3ae forward raises TypeError (DropPath.forward's return is commented
    out, m3ae.py:53-62, and Block invokes it with deterministic=False,
    m3ae.py:148,153 -> ``inputs + None``). Our identity repair is the
    documented delta, not a silent behavior change."""
    import argparse

    import torch

    ref = load_reference()
    with tiny_ref_m3ae(depth=1, fix_droppath=False):
        args = argparse.Namespace(dataset="MVSA", modulation="Normal",
                                  fusion_method="concat", gs_flag=True,
                                  clip=False, modal3=False)
        _load = torch.load
        torch.load = lambda *a, **k: {}
        try:
            model = ref.M3AEClassifier(args)
        finally:
            torch.load = _load
        token = torch.zeros((2, 1, 8), dtype=torch.long)
        pm = torch.zeros((2, 1, 8))
        image = torch.zeros((2, 3, 64, 64))
        with pytest.raises(TypeError):
            model(token, pm, image)
