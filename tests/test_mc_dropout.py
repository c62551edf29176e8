"""MC-dropout parity: exact-parity mode with injected fixed masks, plus
statistical sanity of the epistemic estimates (SURVEY §7 'hard parts':
RNG streams differ from TF, so parity is defined (a) exactly under
injected masks and (b) statistically over T samples)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bayesian_yolov3_tpu.core.blueprint import Variant, VariantSpec
from bayesian_yolov3_tpu.core.priors import ECP_9_PRIORS
from bayesian_yolov3_tpu.models import yolov3
from bayesian_yolov3_tpu.ops import common, decode

IMG = (64, 96, 3)


def _model():
    return yolov3.YoloV3(
        spec=VariantSpec(Variant.BAYESIAN, 2), priors=ECP_9_PRIORS, img_size=IMG
    )


def test_exact_parity_with_injected_masks(monkeypatch):
    """With dropout masks forced to all-ones (keep everything), the bayesian
    T-sample forward must equal the deterministic no-dropout forward scaled
    consistently — i.e. every sample identical and equal to the
    standard_test_dropout path up to the 1/keep_prob factor structure."""
    m = _model()
    params, stats = m.init(jax.random.PRNGKey(0))
    img = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (1, *IMG)).astype(np.float32)
    )

    real_dropout = common.dropout

    def keep_all_dropout(x, rate, rng, **kw):
        # inject a fixed mask of ones: output = x / keep (inverted dropout)
        return x / (1.0 - rate)

    monkeypatch.setattr(common, "dropout", keep_all_dropout)
    raws = m.mc_forward(params, stats, img, T=3, rng=jax.random.PRNGKey(1))
    monkeypatch.setattr(common, "dropout", real_dropout)

    # all samples identical under a fixed mask
    for r in raws:
        np.testing.assert_array_equal(np.asarray(r[0]), np.asarray(r[1]))
        np.testing.assert_array_equal(np.asarray(r[1]), np.asarray(r[2]))

    # and reproducible: the injected-mask forward is pure
    monkeypatch.setattr(common, "dropout", keep_all_dropout)
    raws2 = m.mc_forward(params, stats, img, T=3, rng=jax.random.PRNGKey(9))
    np.testing.assert_array_equal(np.asarray(raws[0]), np.asarray(raws2[0]))


@pytest.mark.parametrize("impl", ["hash", "bits"])
def test_dropout_mask_statistics(rng, impl):
    """Inverted-dropout contract: E[out] = x, zeros fraction ~ rate."""
    x = jnp.ones((64, 64), jnp.float32)
    out = np.asarray(common.dropout(x, 0.1, jax.random.PRNGKey(0), impl=impl))
    zero_frac = (out == 0).mean()
    assert 0.05 < zero_frac < 0.15
    np.testing.assert_allclose(out[out != 0], 1.0 / 0.9, rtol=1e-6)
    np.testing.assert_allclose(out.mean(), 1.0, atol=0.02)


def test_hash_dropout_statistical_quality():
    """The fused-hash Bernoulli draw (ops.common.dropout impl='hash') must
    behave like iid Bernoulli(keep): keep-rate tight at large N, masks
    reproducible per key, decorrelated across keys, and decorrelated along
    the index axis within one mask (lag-1 .. lag-3 autocovariance)."""
    n = 1 << 20
    x = jnp.ones((n,), jnp.float32)
    k1, k2 = jax.random.PRNGKey(3), jax.random.PRNGKey(4)
    m1 = (np.asarray(common.dropout(x, 0.1, k1)) != 0).astype(np.float64)
    m1b = (np.asarray(common.dropout(x, 0.1, k1)) != 0).astype(np.float64)
    m2 = (np.asarray(common.dropout(x, 0.1, k2)) != 0).astype(np.float64)

    # keep-rate: binomial std at n=2^20, p=0.9 is ~2.9e-4 -> 5 sigma gate
    assert abs(m1.mean() - 0.9) < 1.5e-3, m1.mean()
    np.testing.assert_array_equal(m1, m1b)  # same key -> same mask
    assert (m1 != m2).mean() > 0.1  # different key -> different mask

    def corr(a, b):
        a = a - a.mean()
        b = b - b.mean()
        return float((a * b).mean() / np.sqrt((a * a).mean() * (b * b).mean()))

    # cross-key correlation ~ 0 (5 sigma of 1/sqrt(n) ~ 5e-3)
    assert abs(corr(m1, m2)) < 5e-3
    # within-mask autocorrelation at small lags ~ 0 (adjacent activations
    # share conv windows, so index-local structure would bias the MC stats)
    for lag in (1, 2, 3, 64):
        assert abs(corr(m1[:-lag], m1[lag:])) < 5e-3, lag


def test_hash_dropout_keys_are_not_index_translates():
    """Distinct keys must yield masks that are NOT index-translates of each
    other.  A pure entry-xor hash has mask_k2(i) == mask_k1(i ^ (k1^k2))
    for every i — a structural pairwise dependence between MC samples that
    violates the iid assumption behind the epistemic variance (the
    mid-pipeline key add in ops.common.dropout breaks it).

    Seeds 4/104 are chosen so their scalar site keys differ by a small
    xor-delta (928311 < 2^20), keeping every translated index in range."""
    k1, k2 = jax.random.PRNGKey(4), jax.random.PRNGKey(104)
    s1 = int(jax.random.bits(k1, (), jnp.uint32))
    s2 = int(jax.random.bits(k2, (), jnp.uint32))
    delta = s1 ^ s2
    assert 0 < delta < (1 << 20)  # seed-pair precondition

    n = 1 << 21  # delta only flips bits 0..19 -> i ^ delta always < n
    x = jnp.ones((n,), jnp.float32)
    rate = 0.1
    m1 = np.asarray(common.dropout(x, rate, k1)) != 0
    m2 = np.asarray(common.dropout(x, rate, k2)) != 0
    translated = m2[np.arange(n, dtype=np.int64) ^ delta]

    agree = (m1 == translated).mean()
    # translate-structured masks agree everywhere; independent masks agree
    # with prob keep^2 + rate^2 = 0.82 (binomial std ~ 2.7e-4 at n=2^21)
    assert agree < 0.99, "masks are index-translates of each other"
    assert abs(agree - 0.82) < 5e-3, agree


def test_epistemic_variance_positive_and_vanishes_without_dropout():
    """Statistical parity: MC sampling yields positive epistemic variance;
    with dropout disabled the epistemic covariance collapses to ~0."""
    m = _model()
    params, stats = m.init(jax.random.PRNGKey(0))
    img = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (1, *IMG)).astype(np.float32)
    )
    raws = m.mc_forward(params, stats, img, T=8, rng=jax.random.PRNGKey(2))
    det = decode.split_detection(raws[0], m.spec)
    st = decode.decode_epistemic_stats(det)
    epi = np.asarray(jnp.diagonal(st["epi_covar_loc"], axis1=-2, axis2=-1))
    assert epi.mean() > 1e-8  # dropout induces spread

    # same T samples but deterministic (standard_test_dropout): zero spread
    raw_det, _ = m.forward(
        params, stats, img, rng=jax.random.PRNGKey(3), standard_test_dropout=True
    )
    det2 = decode.split_detection(
        jnp.repeat(raw_det[0], 8, axis=0), m.spec
    )
    st2 = decode.decode_epistemic_stats(det2)
    epi2 = np.asarray(jnp.diagonal(st2["epi_covar_loc"], axis1=-2, axis2=-1))
    np.testing.assert_allclose(epi2, 0.0, atol=1e-5)


def test_fixed_mc_masks_deterministic_and_statistically_sound():
    """fixed_masks mode: (a) output is identical across different rng keys
    (determinism is the feature's contract), (b) a different seed changes
    the masks, (c) samples still differ from each other (real MC spread),
    (d) per-site keep rate stays ~0.9."""
    m = _model()
    params, stats = m.init(jax.random.PRNGKey(0))
    img = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (1, *IMG)).astype(np.float32)
    )

    def run(seed, rng_seed):
        outs = yolov3.mc_forward_cf(
            params, stats, img, spec=m.spec, T=6,
            rng=jax.random.PRNGKey(rng_seed), fixed_masks=seed,
        )
        return [np.asarray(r) for r, _ in outs]

    a = run(0, 1)
    b = run(0, 2)  # different rng — must not matter
    c = run(7, 1)  # different seed — must matter
    for ra, rb in zip(a, b):
        np.testing.assert_array_equal(ra, rb)
    assert any(np.abs(ra - rc).max() > 1e-6 for ra, rc in zip(a, c))
    # samples differ within one forward (raw_cf layout: (ch, T, hw))
    s = a[0]
    assert np.abs(s[:, 0] - s[:, 1]).max() > 1e-6

    # keep rate of the fixed-key hash masks at one site
    x = jnp.ones((1 << 20,), jnp.float32)
    kept = float(np.mean(np.asarray(
        common.dropout(x, 0.1, None, key_u32=jnp.uint32(0xDEADBEEF))) != 0))
    assert abs(kept - 0.9) < 0.002, kept


def test_fixed_mc_masks_paths_agree():
    """mc_forward and mc_forward_cf share _fixed_key_table, so for the same
    seed they draw bit-identical masks; outputs agree up to conv-layout
    float noise (the two paths contract the 1x1 heads differently)."""
    m = _model()
    params, stats = m.init(jax.random.PRNGKey(0))
    img = jnp.asarray(
        np.random.default_rng(2).uniform(0, 1, (1, *IMG)).astype(np.float32)
    )
    T, seed = 4, 5

    plain = yolov3.mc_forward(
        params, stats, img, spec=m.spec, T=T,
        rng=jax.random.PRNGKey(0), fixed_masks=seed,
    )
    cf = yolov3.mc_forward_cf(
        params, stats, img, spec=m.spec, T=T,
        rng=jax.random.PRNGKey(9), fixed_masks=seed,
    )
    for r, (raw_cf, (h, w)) in zip(plain, cf):
        r = np.asarray(r)  # (T, h, w, ch)
        want = r.transpose(3, 0, 1, 2).reshape(r.shape[3], T, h * w)
        np.testing.assert_allclose(np.asarray(raw_cf), want,
                                   rtol=1e-4, atol=1e-4)
