import jax.numpy as jnp
import numpy as np

from protoasnet_tpu.models.layers import prototype_class_identity
from protoasnet_tpu.push.push import batch_winners


def test_batch_winners_matches_bruteforce():
    rng = np.random.default_rng(0)
    b, p, d, k = 6, 8, 5, 4
    t, h, w = 2, 3, 3
    dist = rng.uniform(0, 1, size=(b, p)).astype(np.float32)
    occ = rng.uniform(0, 1, size=(b, t, h, w, p)).astype(np.float32)
    roi = rng.normal(size=(b, p, d)).astype(np.float32)
    gt = rng.integers(0, k, size=b).astype(np.int32)
    valid = np.ones(b, bool)
    ident = prototype_class_identity(p, k)
    class_id = np.argmax(ident, axis=1).astype(np.int32)
    class_specific = np.ones(p, bool)
    class_specific[6:] = False  # last class (abstain-like) not class-specific

    best, idx, w_roi, w_occ = batch_winners(
        jnp.asarray(dist), jnp.asarray(occ), jnp.asarray(roi),
        jnp.asarray(gt), jnp.asarray(valid), class_id, class_specific,
    )
    best, idx = np.asarray(best), np.asarray(idx)
    for j in range(p):
        dj = dist[:, j].copy()
        if class_specific[j]:
            dj[gt != class_id[j]] = np.inf
        assert np.isclose(best[j], dj.min()) or (np.isinf(best[j]) and np.isinf(dj.min()))
        if np.isfinite(best[j]):
            a = int(np.argmin(dj))
            assert idx[j] == a
            np.testing.assert_allclose(np.asarray(w_roi)[j], roi[a, j], rtol=1e-6)
            np.testing.assert_allclose(np.asarray(w_occ)[j], occ[a, ..., j], rtol=1e-6)


def test_batch_winners_respects_valid_mask():
    b, p, k = 4, 4, 4
    dist = np.full((b, p), 0.5, np.float32)
    dist[0] = 0.0  # best sample is invalid (padding)
    occ = np.ones((b, 2, 2, p), np.float32)
    roi = np.ones((b, p, 3), np.float32)
    gt = np.zeros(b, np.int32)
    valid = np.array([False, True, True, True])
    class_id = np.zeros(p, np.int32)
    class_specific = np.zeros(p, bool)
    best, idx, _, _ = batch_winners(
        jnp.asarray(dist), jnp.asarray(occ), jnp.asarray(roi),
        jnp.asarray(gt), jnp.asarray(valid), class_id, class_specific,
    )
    assert (np.asarray(best) == 0.5).all()
    assert (np.asarray(idx) != 0).all()


def test_receptive_field_math():
    from protoasnet_tpu.push.receptive_field import (
        compute_proto_layer_rf_info_v2,
        compute_rf_prototype,
    )

    # resnet18 chain on 224 input: final fmap 7x7, rf jump 32
    from protoasnet_tpu.models.backbones.resnet2d import resnet_features

    ks, ss, ps = resnet_features("resnet18").conv_info()
    rf = compute_proto_layer_rf_info_v2(224, ks, ss, ps, 1)
    assert rf[0] == 7  # n_out
    assert rf[1] == 32  # jump
    box = compute_rf_prototype(224, (3, 0, 6), rf)
    assert box[0] == 3
    assert 0 <= box[1] < box[2] <= 224
    assert 0 <= box[3] < box[4] <= 224
