"""float64 identity check for the combined TransformLoss forward (run in
a SUBPROCESS by tests/test_train_step.py — x64 mode is process-global).

The combined path folds occ(affine(x)) into the main backbone dispatch by
vmapping over a stacked (2, N, ...) pair (train/steps.py::_pair_forward).
This driver proves it is MATHEMATICALLY identical to the reference-shaped
two-pass path — loss bit-comparable and every gradient leaf within 1e-6
of leaf max — so the fp32 tolerance in the fast test only has to absorb
reduction-order noise, not semantics.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from protoasnet_tpu.losses.bundle import LossBundle
from protoasnet_tpu.models.builder import build_model, init_model
from protoasnet_tpu.train.steps import make_xprotonet_loss_fn

CRITERION = {
    "CeLossAbstain": {"loss_weight": 1, "ab_weight": 0.3,
                      "ab_logitpath": "joined", "reduction": "mean"},
    "ClusterRoiFeat": {"loss_weight": 0.8},
    "SeparationRoiFeat": {"loss_weight": 0.08},
    "Lnorm_occurrence": {"p": 2, "loss_weight": 1e-4},
    "trans_occurrence": {"loss_weight": 0.001, "reduction": "mean"},
    "Lnorm_FC": {"p": 1, "loss_weight": 1e-4},
}


def main():
    assert jnp.zeros(1).dtype == jnp.float64, "x64 mode did not engage"
    cfg = {"name": "Video_XProtoNet", "base_architecture": "resnet2p1d_18",
           "backbone_last_layer_num": -3, "prototype_shape": (8, 64, 1, 1, 1),
           "num_classes": 4, "img_size": 32}
    model = build_model(cfg, dtype=jnp.float64)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.uniform(-0.5, 2.0, size=(3, 8, 32, 32, 3)))
    y = jnp.asarray(rng.integers(0, 3, size=3).astype(np.int32))
    v = jnp.ones(3, bool)
    params, stats = init_model(model, x[:1], seed=0)
    bundle = LossBundle(CRITERION, num_classes=4, abstain_class=True)
    ident = jnp.asarray(model.class_identity())
    key = jax.random.PRNGKey(9)

    outs = {}
    for combined in (True, False):
        loss_fn = make_xprotonet_loss_fn(model, bundle, ident,
                                         combined=combined)
        (tot, aux), g = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(
            params, stats, x, y, v, key)
        outs[combined] = (float(tot), aux, g)

    (tot_a, aux_a, g_a), (tot_b, aux_b, g_b) = outs[True], outs[False]
    np.testing.assert_allclose(tot_a, tot_b, rtol=1e-12)
    assert float(aux_a["terms"]["loss_RoiTrans"]) != 0.0
    worst = 0.0
    for ga, gb in zip(jax.tree_util.tree_leaves(g_a),
                      jax.tree_util.tree_leaves(g_b)):
        rel = float(jnp.max(jnp.abs(ga - gb))
                    / (jnp.max(jnp.abs(ga)) + 1e-30))
        worst = max(worst, rel)
    assert worst < 1e-6, f"float64 grad divergence {worst}"
    for sa, sb in zip(jax.tree_util.tree_leaves(aux_a["batch_stats"]),
                      jax.tree_util.tree_leaves(aux_b["batch_stats"])):
        np.testing.assert_allclose(np.asarray(sa), np.asarray(sb),
                                   rtol=1e-10, atol=1e-12)
    print(f"worst grad rel-to-leaf-max diff: {worst:.3e}")
    print("COMBINED_TRANSFORM_OK")


if __name__ == "__main__":
    main()
