"""Checkpoint/resume: a chunked run with a mid-run save/restore must
reproduce the single-shot trajectory bit-for-bit (full Adam state
round-trips)."""

import os

import numpy as np
import pytest

from fcsr_tpu.data import load_or_synthesize
from fcsr_tpu.data.datamodule import kfold_indices
from fcsr_tpu.train import GSRTrainConfig
from fcsr_tpu.train.fast_loop import GSRFoldRunner

CFG = GSRTrainConfig(lr_dim=20, hr_dim=32, hidden_dim=32, ks=(0.9, 0.7),
                     epochs=6)


def _setup():
    d = load_or_synthesize(None, n_train=9, n_test=1)
    lr = d["lr_train"][:, :20, :20].copy()
    hr = d["hr_train"][:, :32, :32].copy()
    return lr, hr, kfold_indices(9, 3, seed=42)


def test_fingerprint_discriminates_runs():
    """The checkpoint fingerprint must separate runs by config, fold
    plan, and dataset content (fast-lane coverage; the end-to-end
    discard/resume behavior is exercised by the slow tests below)."""
    import dataclasses

    lr, hr, folds = _setup()
    r1 = GSRFoldRunner(CFG, lr, hr, folds)
    assert r1.fingerprint == GSRFoldRunner(CFG, lr, hr, folds).fingerprint
    other = kfold_indices(9, 3, seed=7)
    assert r1.fingerprint != GSRFoldRunner(CFG, lr, hr, other).fingerprint
    cfg2 = dataclasses.replace(CFG, epochs=7)
    assert r1.fingerprint != GSRFoldRunner(cfg2, lr, hr, folds).fingerprint
    hr2 = hr.copy()
    hr2[0, 0, 1] += 0.5
    hr2[0, 1, 0] += 0.5
    assert r1.fingerprint != GSRFoldRunner(CFG, lr, hr2, folds).fingerprint


@pytest.mark.slow
def test_chunked_run_matches_single_shot(tmp_path):
    lr, hr, folds = _setup()
    p1, l1, e1 = GSRFoldRunner(CFG, lr, hr, folds).train()

    ck = str(tmp_path / "ck.msgpack")
    p2, l2, e2 = GSRFoldRunner(CFG, lr, hr, folds).train(
        checkpoint_path=ck, checkpoint_every=2)
    assert os.path.exists(ck)
    np.testing.assert_allclose(np.asarray(l1), l2, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)


@pytest.mark.slow
def test_chunked_no_checkpoint_matches_single_shot():
    """chunk_epochs (the bench protocol: repeated launches of one small
    program, state device-resident, no I/O) is trajectory-identical to
    the monolithic single-shot program."""
    lr, hr, folds = _setup()
    p1, l1, e1 = GSRFoldRunner(CFG, lr, hr, folds).train()
    p2, l2, e2 = GSRFoldRunner(CFG, lr, hr, folds).train(chunk_epochs=2)
    assert l2.shape == np.asarray(l1).shape
    np.testing.assert_allclose(np.asarray(l1), l2, atol=1e-6)
    np.testing.assert_allclose(np.asarray(e1), e2, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)


@pytest.mark.slow
def test_stale_checkpoint_discarded(tmp_path):
    """A checkpoint from a different run (other folds/config/dataset) at
    the same path must be detected via its fingerprint and discarded, not
    restored (ADVICE r2: stale-blob corruption)."""
    lr, hr, folds = _setup()
    ck = str(tmp_path / "ck.msgpack")

    # a finished run with DIFFERENT folds writes the checkpoint
    other_folds = kfold_indices(9, 3, seed=7)
    GSRFoldRunner(CFG, lr, hr, other_folds).train(checkpoint_path=ck,
                                                  checkpoint_every=3)
    assert os.path.exists(ck)

    p_ref, l_ref, _ = GSRFoldRunner(CFG, lr, hr, folds).train()
    with pytest.warns(UserWarning, match="fingerprint mismatch"):
        p2, l2, _ = GSRFoldRunner(CFG, lr, hr, folds).train(
            checkpoint_path=ck, checkpoint_every=2)
    np.testing.assert_allclose(np.asarray(l_ref), l2, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_ref), np.asarray(p2),
                               atol=1e-6)

    # same-run checkpoints still resume: fingerprints match
    r = GSRFoldRunner(CFG, lr, hr, folds)
    r2 = GSRFoldRunner(CFG, lr, hr, folds)
    assert r.fingerprint == r2.fingerprint
    assert r.fingerprint != GSRFoldRunner(CFG, lr, hr, other_folds).fingerprint


@pytest.mark.slow
def test_resume_after_interrupt(tmp_path):
    """Simulate a crash after the first chunk: a fresh runner resuming
    from the checkpoint completes to the same final state."""
    import flax.serialization as ser

    lr, hr, folds = _setup()
    p_ref, l_ref, _ = GSRFoldRunner(CFG, lr, hr, folds).train()

    r = GSRFoldRunner(CFG, lr, hr, folds)
    state, lh, eh = r._run_chunk(r.fresh_state(), 2)
    ck = str(tmp_path / "ck.msgpack")
    blob = {"state": [np.asarray(x) for x in state], "epoch": 2,
            "fingerprint": r.fingerprint,
            "loss_hist": np.asarray(lh), "err_hist": np.asarray(eh)}
    with open(ck, "wb") as f:
        f.write(ser.msgpack_serialize(blob))

    r2 = GSRFoldRunner(CFG, lr, hr, folds)  # fresh process stand-in
    p2, l2, _ = r2.train(checkpoint_path=ck, checkpoint_every=2)
    np.testing.assert_allclose(np.asarray(l_ref), l2, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_ref), np.asarray(p2),
                               atol=1e-6)


@pytest.mark.slow
def test_chunked_resume_fused_adam(tmp_path):
    """The production bench path (cfg.fused_adam: whole-step+Adam
    kernel) round-trips its state through checkpoint chunks exactly —
    the flat <-> kernel-leaf conversions at chunk boundaries are
    lossless."""
    cfg = GSRTrainConfig(lr_dim=20, hr_dim=32, hidden_dim=32,
                         ks=(0.9, 0.7), epochs=4, fused_adam=True)
    lr, hr, folds = _setup()
    p_ref, l_ref, _ = GSRFoldRunner(cfg, lr, hr, folds).train()
    ck = str(tmp_path / "ck.msgpack")
    p2, l2, _ = GSRFoldRunner(cfg, lr, hr, folds).train(
        checkpoint_path=ck, checkpoint_every=2)
    np.testing.assert_array_equal(np.asarray(l_ref), np.asarray(l2))
    np.testing.assert_array_equal(np.asarray(p_ref), np.asarray(p2))
