"""Downstream sleep-staging subsystem tests (hermetic synthetic stages)."""
import numpy as np
import jax
from sleepgen.utils import jit_init
import jax.numpy as jnp
import pytest

from sleepgen.data.staging import (
    STAGE_MAPPING,
    balanced_class_weights,
    center_label,
    sequence_indices,
    standard_scale_windows,
    windows_from_annotations,
)
from sleepgen.nn.chambon import SleepStagerChambon2018, TimeDistributedStager


def _synthetic_staged_recording(seed=0, n_epochs_rec=20, sfreq=100):
    """Per-stage distinguishable signals: stage k = sine at (2+3k) Hz."""
    rng = np.random.default_rng(seed)
    stages = ["Sleep stage W", "Sleep stage 1", "Sleep stage 2",
              "Sleep stage 3", "Sleep stage R"]
    t = np.arange(30 * sfreq) / sfreq
    sig, anns = [], []
    for i in range(n_epochs_rec):
        s = rng.integers(0, 5)
        f = 2 + 3 * s
        sig.append(np.sin(2 * np.pi * f * t) + 0.1 * rng.normal(size=len(t)))
        anns.append((i * 30.0, 30.0, stages[s]))
    return np.concatenate(sig), anns


def test_windows_from_annotations():
    sig, anns = _synthetic_staged_recording()
    x, y = windows_from_annotations(sig, 100, anns)
    assert x.shape == (20, 3000, 1)
    assert y.shape == (20,)
    assert set(np.unique(y)) <= {0, 1, 2, 3, 4}
    # long annotation splits into multiple windows
    x2, y2 = windows_from_annotations(sig, 100, [(0.0, 90.0, "Sleep stage 2")])
    assert x2.shape[0] == 3 and np.all(y2 == 2)


def test_standard_scale_and_weights():
    x = np.random.default_rng(0).normal(5, 3, size=(4, 3000, 1))
    xs = standard_scale_windows(x)
    np.testing.assert_allclose(xs.mean(axis=1), 0, atol=1e-5)
    np.testing.assert_allclose(xs.std(axis=1), 1, atol=1e-4)

    y = np.array([0, 0, 0, 1])
    w = balanced_class_weights(y, n_classes=5)
    # sklearn: n/(k_present*count) = 4/(2*3), 4/(2*1)
    np.testing.assert_allclose(w[:2], [4 / 6, 4 / 2], rtol=1e-6)
    assert np.all(w[2:] == 0)


def test_sequence_sampler_and_center_label():
    rec = np.array([0] * 7 + [1] * 4)
    seqs = sequence_indices(rec, n_windows=3, stride=3)
    # rec 0: starts 0,3 (7 windows); rec 1: start 7 (4 windows)
    assert seqs.shape == (3, 3)
    assert (seqs[:2] < 7).all() and (seqs[2] >= 7).all()
    labels = np.arange(11)
    np.testing.assert_array_equal(center_label(labels, seqs), [1, 4, 8])


@pytest.mark.slow
def test_chambon_shapes_and_learning():
    """The 3-window stager must fit trivially separable synthetic stages."""
    from sleepgen.train.decode import train_decoder

    sig, anns = _synthetic_staged_recording(seed=1, n_epochs_rec=60)
    x, y = windows_from_annotations(sig, 100, anns)
    x = standard_scale_windows(x)
    seqs = sequence_indices(np.zeros(len(x)), 3, 1)
    xs = x[seqs]  # (M, 3, 3000, 1)
    ys = center_label(y, seqs)

    model = TimeDistributedStager(n_chans=1, sfreq=100, feat_dropout=0.0,
                                  head_dropout=0.0)
    res = train_decoder(model, (xs[:40], ys[:40]), (xs[40:], ys[40:]),
                        n_epochs=12, batch_size=16)
    assert res.confusion.sum() == len(ys[40:])
    assert res.best_valid_bal_acc > 0.5  # separable by frequency

    # single-window stager forward shape
    m1 = SleepStagerChambon2018(n_chans=1, sfreq=100)
    v = jit_init(m1, {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                jnp.asarray(x[:2]), train=False)
    out = m1.apply(v, jnp.asarray(x[:2]), train=False)
    assert out.shape == (2, 5)


def test_deepsleepnet_forward_shapes():
    from sleepgen.nn.deepsleepnet import DeepSleepNet

    m = DeepSleepNet(n_outputs=5, sfreq=100)
    x = jnp.zeros((2, 3000, 1))
    v = jit_init(m, {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
               x, train=False)
    # jitted applies: the eager CNN+BiLSTM dispatch alone is ~15 s on the
    # 1-core CPU host; one cached graph per input rank
    apply = jax.jit(lambda v_, x_: m.apply(v_, x_, train=False))
    y = apply(v, x)
    assert y.shape == (2, 5)
    # sequence mode
    xs = jnp.zeros((2, 3, 3000, 1))
    ys = apply(v, xs)
    assert ys.shape == (2, 3, 5)


def test_im2col_conv_matches_nn_conv():
    """Im2ColConv1d must be numerically identical (same params) to the
    nn.Conv it replaces — it exists only to sidestep the pathological
    TPU compile of wide-kernel conv backward passes."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sleepgen.nn.chambon import Im2ColConv1d
    from sleepgen.nn.layers import conv1d

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 301, 3))
    ref = conv1d(8, 50, padding=[(10, 10)])
    vref = jit_init(ref, rng, x)
    m = Im2ColConv1d(8, 50, padding=(10, 10))
    y_ref = ref.apply(vref, x)
    y = m.apply(vref, x)
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_im2col_conv_strided_same_matches_nn_conv():
    """Strided SAME-padded im2col form == nn.Conv (DeepSleepNet entry convs)."""
    import jax
    import numpy as np
    from sleepgen.nn.chambon import Im2ColConv1d
    from sleepgen.nn.layers import conv1d

    rng = jax.random.PRNGKey(1)
    for k, s, t in [(50, 6, 3000), (400, 50, 3000), (7, 3, 29)]:
        x = jax.random.normal(jax.random.fold_in(rng, k), (2, t, 1))
        ref = conv1d(16, k, stride=s, use_bias=False)
        vref = jit_init(ref, rng, x)
        m = Im2ColConv1d(16, k, stride=s, padding="SAME", use_bias=False)
        y_ref = ref.apply(vref, x)
        y = m.apply(vref, x)
        assert y.shape == y_ref.shape, (k, s, y.shape, y_ref.shape)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=2e-5, atol=2e-5)


def test_synthetic_staged_fixture_is_not_saturated():
    """The round-2 fixture (one clean tone per stage) was solved at
    balanced acc 1.0 by every decoder, so it pinned nothing (VERDICT r2).
    Pin the reworked fixture's difficulty: a band-power linear probe must
    land strictly between chance and ceiling, with realistic structure
    (sticky Markov stages, all 5 classes, N1/REM confusable)."""
    from sleepgen.data.staging import make_synthetic_staged

    x, y, rids = make_synthetic_staged(16, 40, seed=0)
    assert x.shape == (16 * 40, 3000, 1)
    assert set(np.unique(y)) == {0, 1, 2, 3, 4}

    # Markov stickiness: consecutive windows agree far more than iid would
    same = np.mean([
        np.mean(y[rids == r][1:] == y[rids == r][:-1]) for r in range(16)])
    assert same > 0.4, same

    # cheap spectral linear probe: subject-split, balanced accuracy must be
    # informative but NOT saturated
    spec = np.abs(np.fft.rfft(x[..., 0], axis=-1)) ** 2
    freqs = np.fft.rfftfreq(3000, 0.01)
    bands = [(0.5, 2), (2, 4), (4, 8), (8, 12), (12, 16), (16, 25), (25, 45)]
    feats = np.stack([np.log(spec[:, (freqs >= lo) & (freqs < hi)].mean(-1)
                             + 1e-12) for lo, hi in bands], -1)
    tr, te = np.isin(rids, range(12)), np.isin(rids, range(12, 16))
    mu, sd = feats[tr].mean(0), feats[tr].std(0) + 1e-9
    ftr, fte = (feats[tr] - mu) / sd, (feats[te] - mu) / sd

    from sklearn.linear_model import LogisticRegression
    from sklearn.metrics import balanced_accuracy_score

    clf = LogisticRegression(max_iter=1000, class_weight="balanced")
    clf.fit(ftr, y[tr])
    acc = balanced_accuracy_score(y[te], clf.predict(fte))
    assert 0.35 < acc < 0.95, acc
