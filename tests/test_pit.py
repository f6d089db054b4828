"""PIT loss tests: recovers a known permutation with zero loss (the
reference's own self-test contract, css/training/losses.py:109-127)."""
import numpy as np

from notsofar_tpu.ops.pit import pit_loss, permute_sources, pairwise_loss_matrix, l1_loss


def test_pit_recovers_permutation():
    rng = np.random.RandomState(43236)
    for _ in range(5):
        targets = rng.rand(2, 50, 129, 3).astype(np.float32)
        p = (2, 0, 1)
        preds = targets[..., p]
        loss, perm = pit_loss(preds, targets, base="mse")
        assert np.allclose(np.asarray(loss), 0.0, atol=1e-12)
        assert (np.asarray(perm) == np.array([p, p])).all()
        # targets[..., perm] must equal preds
        aligned = np.asarray(permute_sources(targets, perm))
        np.testing.assert_array_equal(aligned, preds)


def test_pit_matches_exhaustive_numpy():
    rng = np.random.RandomState(7)
    preds = rng.rand(4, 20, 3).astype(np.float32)
    targets = rng.rand(4, 20, 3).astype(np.float32)
    loss, perm = pit_loss(preds, targets, base="l1")
    import itertools
    for b in range(4):
        best = None
        for p in itertools.permutations(range(3)):
            v = np.mean([np.abs(preds[b, :, i] - targets[b, :, p[i]]).mean()
                         for i in range(3)])
            best = v if best is None else min(best, v)
        assert np.isclose(float(loss[b]), best, rtol=1e-5)


def test_pairwise_loss_matrix_shape():
    preds = np.zeros((2, 10, 4, 3), np.float32)
    targets = np.ones((2, 10, 4, 3), np.float32)
    lm = pairwise_loss_matrix(preds, targets, l1_loss)
    assert lm.shape == (2, 3, 3)
    assert np.allclose(np.asarray(lm), 1.0)
