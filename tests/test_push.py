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


def test_push_prototypes_sharded_mesh(synthetic_csv, tmp_path):
    """Full push pipeline over an 8-device data mesh: per-batch argmin
    spans shards inside jit; winners match the single-device scan."""
    import jax
    from protoasnet_tpu.losses.bundle import LossBundle
    from protoasnet_tpu.models.builder import build_model, init_model
    from protoasnet_tpu.data.dataset import get_as_dataloader
    from protoasnet_tpu.parallel import make_mesh, shard_batch
    from protoasnet_tpu.push.push import push_prototypes
    from protoasnet_tpu.train.optim import make_adam
    from protoasnet_tpu.train.steps import make_xprotonet_steps

    cfg = {"name": "Video_XProtoNet", "base_architecture": "resnet2p1d_18",
           "backbone_last_layer_num": -3, "prototype_shape": (8, 32, 1, 1, 1),
           "num_classes": 4, "img_size": 32}
    model = build_model(cfg)
    params, stats = init_model(model, jnp.zeros((1, 8, 32, 32, 3)), seed=0)
    tx = make_adam(params=params)
    _, _, push_step = make_xprotonet_steps(model, LossBundle({}, 4, True), tx)

    dcfg = {"data_info_file": synthetic_csv, "view": "all", "sample_size": None,
            "sampler": "random", "augmentation": False, "normalize": True,
            "img_size": 32, "frames": 8, "batch_size": 8,
            "iterate_intervals": False, "interval_unit": "cycle",
            "interval_quant": 1.0}
    mesh = make_mesh()
    ident = model.class_identity()

    _, info_single = push_prototypes(
        get_as_dataloader(dcfg, "train", "push", seed=0), push_step, params,
        stats, class_identity=ident, abstain_class=True, render=False,
        replace_prototypes=False)
    _, info_mesh = push_prototypes(
        get_as_dataloader(dcfg, "train", "push", seed=0), push_step, params,
        stats, class_identity=ident, abstain_class=True, render=False,
        replace_prototypes=False, shard_fn=lambda b: shard_batch(mesh, b))

    np.testing.assert_allclose(
        info_single["prototypes_similarity_to_src_ROIs"],
        info_mesh["prototypes_similarity_to_src_ROIs"], rtol=1e-5, atol=1e-6)
    assert list(info_single["prototypes_filenames"]) == \
        list(info_mesh["prototypes_filenames"])


def test_update_carry_ignores_all_masked_batches():
    """A class-specific prototype whose class never appears must stay
    unmatched (batch_id -1, dist inf) — inf <= inf must NOT record a
    bogus wrong-class winner that replace would then copy in."""
    import jax

    from protoasnet_tpu.push.push import _update_carry

    p, b, d, k = 4, 3, 5, 2
    class_id = jnp.asarray(np.array([0, 0, 1, 1], np.int32))
    class_specific = jnp.asarray(np.ones(p, bool))
    carry = {
        "dist": jnp.full((p,), jnp.inf, jnp.float32),
        "roi": jnp.zeros((p, d), jnp.float32),
        "occ": jnp.zeros((p, 2, 2), jnp.float32),
        "logits": jnp.zeros((p, k), jnp.float32),
        "gt": jnp.full((p,), -1, jnp.int32),
        "batch_id": jnp.full((p,), -1, jnp.int32),
        "sample_idx": jnp.full((p,), -1, jnp.int32),
        "scan_pos": jnp.zeros((), jnp.int32),
    }
    rng = np.random.default_rng(0)
    dist = jnp.asarray(rng.uniform(0, 1, size=(b, p)).astype(np.float32))
    occ = jnp.asarray(rng.uniform(size=(b, 2, 2, p)).astype(np.float32))
    roi = jnp.asarray(rng.normal(size=(b, p, d)).astype(np.float32))
    logits = jnp.zeros((b, k), jnp.float32)
    gt = jnp.zeros(b, jnp.int32)  # batch contains ONLY class 0
    valid = jnp.ones(b, bool)

    out = jax.device_get(_update_carry(
        carry, dist, occ, roi, logits, gt, valid,
        class_id, class_specific))
    assert (out["batch_id"][:2] == 0).all()
    assert (out["batch_id"][2:] == -1).all()
    assert np.isinf(out["dist"][2:]).all()
    assert (out["gt"][2:] == -1).all()


# --- push_prototypes_patch (classic ProtoPNet spatial push) regressions ---


class _StubFeatures:
    def conv_info(self):
        return [3], [1], [1]  # one 3x3 s1 p1 conv


class _StubModel:
    prototype_shape = (2, 2, 1, 1)
    features = _StubFeatures()


def _patch_push(batches, class_identity, params):
    """Drive push_prototypes_patch over synthetic (cine, conv, dist) batches.

    Each batch dict carries its own conv (B,1,1,D) and dist (B,1,1,P); the
    stub push_step just returns them, keyed off id(cine)."""
    from protoasnet_tpu.push.push_protopnet import push_prototypes_patch

    by_key = {float(b["cine"][0, 0, 0, 0]): b for b in batches}

    def push_step(params, batch_stats, cine):
        b = by_key[float(np.asarray(cine)[0, 0, 0, 0])]
        return jnp.asarray(b["conv"]), jnp.asarray(b["dist"])

    loader = [
        {"cine": jnp.asarray(b["cine"]), "target_AS": b["target_AS"],
         "valid": b["valid"]}
        for b in batches
    ]
    return push_prototypes_patch(
        loader, push_step, params, {}, _StubModel(),
        class_identity=class_identity, render=False, img_size=8,
        replace_prototypes=True,
    )


def _mk_batch(key, gts, dists, convs):
    """One 2-sample batch: dist (B,1,1,P), conv (B,1,1,D)."""
    b = len(gts)
    cine = np.zeros((b, 1, 1, 3), np.float32)
    cine[0, 0, 0, 0] = key  # marker the stub push_step dispatches on
    return {
        "cine": cine,
        "conv": np.asarray(convs, np.float32).reshape(b, 1, 1, -1),
        "dist": np.asarray(dists, np.float32).reshape(b, 1, 1, -1),
        "target_AS": np.asarray(gts, np.int32),
        "valid": np.ones(b, bool),
    }


def test_patch_push_skips_classes_with_no_samples():
    """Regression: a prototype whose class never appears used to 'win' via
    inf <= inf (all-masked argmin returns index 0), corrupting its vector
    with a wrong-class patch. Reference uses strict < and skips empty
    classes (push_ProtoPNet.py:202-210)."""
    ident = np.eye(2, dtype=np.float32)  # proto 0 -> class 0, proto 1 -> class 1
    params = {"prototype_vectors": jnp.asarray(
        np.arange(4, dtype=np.float32).reshape(2, 1, 1, 2))}
    # only class-0 samples anywhere in the dataset
    batches = [_mk_batch(1.0, [0, 0], [[0.4, 0.2], [0.3, 0.1]],
                         [[1, 1], [2, 2]])]
    new_params, info = _patch_push(batches, ident, params)
    assert np.isinf(info["prototypes_distances"][1])
    assert info["prototypes_gts"][1] == -1
    # unmatched prototype vector is untouched
    np.testing.assert_array_equal(
        np.asarray(new_params["prototype_vectors"])[1],
        np.asarray(params["prototype_vectors"])[1])
    # matched prototype 0 took the batch's best class-0 patch (sample 1)
    assert np.isclose(info["prototypes_distances"][0], 0.3)
    np.testing.assert_allclose(
        np.asarray(new_params["prototype_vectors"])[0, 0, 0], [2, 2])


def test_patch_push_records_global_sample_index():
    """Regression: bb.npy / bb-receptive_field.npy column 0 used to store
    the within-batch index; the reference stores the index into the push
    loader's full iteration order (push_ProtoPNet.py:92,256)."""
    ident = np.eye(2, dtype=np.float32)
    params = {"prototype_vectors": jnp.asarray(
        np.zeros((2, 1, 1, 2), np.float32))}
    # winner for BOTH prototypes lives in the SECOND batch, sample 1 of 2
    batches = [
        _mk_batch(1.0, [0, 1], [[0.9, 0.9], [0.9, 0.9]], [[1, 1], [2, 2]]),
        _mk_batch(2.0, [1, 0], [[0.9, 0.2], [0.1, 0.9]], [[3, 3], [4, 4]]),
    ]
    _, info = _patch_push(batches, ident, params)
    # global indices: proto 0 won batch-2 sample 1 -> 3; proto 1 sample 0 -> 2
    assert info["bb"][0, 0] == 3 and info["bb"][1, 0] == 2
    assert info["bb_rf"][0, 0] == 3 and info["bb_rf"][1, 0] == 2
