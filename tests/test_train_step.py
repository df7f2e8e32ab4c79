import jax
import jax.numpy as jnp
import numpy as np
import pytest

from protoasnet_tpu.losses.bundle import LossBundle
from protoasnet_tpu.models.builder import build_model, init_model
from protoasnet_tpu.train.optim import make_adam
from protoasnet_tpu.train.steps import TrainState, make_xprotonet_steps

CRITERION = {
    "CeLossAbstain": {"loss_weight": 1, "ab_weight": 0.3,
                      "ab_logitpath": "joined", "reduction": "mean"},
    "ClusterRoiFeat": {"loss_weight": 0.8, "reduction": "mean"},
    "SeparationRoiFeat": {"loss_weight": 0.08, "reduction": "mean"},
    "OrthogonalityLoss": {"loss_weight": 0.0, "mode": "per_class"},
    "Lnorm_occurrence": {"p": 2, "loss_weight": 0.0, "reduction": "mean"},
    "trans_occurrence": {"loss_weight": 0.001, "reduction": "mean"},
    "Lnorm_FC": {"p": 1, "loss_weight": 0.0001},
}


@pytest.fixture(scope="module")
def setup():
    model_cfg = {
        "name": "Video_XProtoNet",
        "base_architecture": "resnet2p1d_18",
        "backbone_last_layer_num": -3,
        "prototype_shape": (8, 64, 1, 1, 1),
        "num_classes": 4,
        "img_size": 32,
    }
    model = build_model(model_cfg)
    x = jnp.zeros((2, 8, 32, 32, 3))
    params, batch_stats = init_model(model, x, seed=0)
    bundle = LossBundle(CRITERION, num_classes=4, abstain_class=True)
    tx = make_adam(weight_decay_by_group={g: 1e-3 for g in
                                          ("backbone", "add_on", "occurrence",
                                           "last_layer")},
                   params=params)
    state = TrainState.create(params, batch_stats, tx)
    steps = make_xprotonet_steps(model, bundle, tx, accumulation_steps=2,
                                 stage="all", donate=False)
    return model, state, steps


def _batch(rng, n=2, label_dependent=True):
    x = rng.uniform(-0.5, 2.0, size=(n, 8, 32, 32, 3)).astype(np.float32)
    y = rng.integers(0, 3, size=n).astype(np.int32)
    if label_dependent:  # make the mean intensity correlate with the label
        x += y[:, None, None, None, None] * 0.5
    return jnp.asarray(x), jnp.asarray(y), jnp.ones(n, jnp.bool_)


def test_train_step_decreases_loss(setup):
    model, state, (train_step, eval_step, push_step) = setup
    rng = np.random.default_rng(0)
    lrs = {g: jnp.float32(3e-4) for g in
           ("backbone", "add_on", "occurrence", "prototypes", "last_layer")}
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(6):  # ~2.7 s/step on this host; 6 is enough signal
        x, y, v = _batch(rng)
        key, sub = jax.random.split(key)
        state, m = train_step(state, x, y, v, sub, lrs)
        losses.append(float(m["loss_all"]))
        # accumulation: optimizer applies on every 2nd micro step
        assert bool(m["applied"]) == (i % 2 == 1)
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


@pytest.mark.slow
def test_combined_transform_pass_matches_two_pass(setup):
    """The combined 2N-batch TransformLoss forward (one vmapped backbone
    dispatch with per-half BN stats) must reproduce the two-pass path:
    same total loss and per-term values, same raw gradients, same updated
    BN running stats (transformed half's stats discarded). Gradients are
    compared (not post-Adam params): Adam's first step amplifies any
    near-zero fp32 grad difference to a full ±lr sign flip — the same
    noise floor the float64 trajectory suite exists to avoid.

    slow-marked (fast-suite budget, Makefile): ~20 s — the two-pass
    loss_fn compile exists only for this comparison, and the stricter
    float64 twin (test_combined_transform_grads_float64) plus the
    trajectory suite already pin the equivalence in the full run."""
    from protoasnet_tpu.train.steps import make_xprotonet_loss_fn

    model, state, _ = setup
    bundle = LossBundle(CRITERION, num_classes=4, abstain_class=True)
    rng = np.random.default_rng(11)
    x, y, v = _batch(rng, n=3)
    key = jax.random.PRNGKey(9)
    ident = jnp.asarray(model.class_identity())

    outs = {}
    for combined in (True, False):
        loss_fn = make_xprotonet_loss_fn(model, bundle, ident,
                                         combined=combined)
        grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
        (total, aux), grads = grad_fn(state.params, state.batch_stats,
                                      x, y, v, key)
        outs[combined] = (total, aux, grads)

    (tot_a, aux_a, g_a), (tot_b, aux_b, g_b) = outs[True], outs[False]
    np.testing.assert_allclose(float(tot_a), float(tot_b), rtol=2e-5)
    for k in ("loss_RoiTrans", "loss_CE", "loss_RoiNorm"):
        np.testing.assert_allclose(float(aux_a["terms"][k]),
                                   float(aux_b["terms"][k]), rtol=2e-5,
                                   err_msg=f"term {k}")
    assert float(aux_a["terms"]["loss_RoiTrans"]) != 0.0  # term is live
    # fp32 grads through BN backward accumulate up to a few %-of-leaf-max
    # reduction-order noise between the two schedules (a handful of deep-
    # backbone elements land near 3% of leaf max depending on the init
    # draw); a semantic bug (e.g. joint BN stats) would be O(1). The
    # float64 subprocess test (test_combined_transform_grads_float64)
    # pins identity at 1e-6.
    for ga, gb in zip(jax.tree_util.tree_leaves(g_a),
                      jax.tree_util.tree_leaves(g_b)):
        scale = max(float(jnp.abs(ga).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=5e-3, atol=4e-2 * scale)
    # BN var via mean-of-squares cancels catastrophically in fp32; the
    # float64 driver pins stats identity at 1e-10
    for sa, sb in zip(jax.tree_util.tree_leaves(aux_a["batch_stats"]),
                      jax.tree_util.tree_leaves(aux_b["batch_stats"])):
        np.testing.assert_allclose(np.asarray(sa), np.asarray(sb),
                                   rtol=1e-3, atol=1e-5)

    # the combined EVAL step also matches the two-pass eval
    evs = {}
    for combined in (True, False):
        tx = make_adam(params=state.params)
        _, ev, _ = make_xprotonet_steps(model, bundle, tx, donate=False,
                                        combine_transform=combined)
        evs[combined] = ev(state.params, state.batch_stats, x, y, v, key)
    for k in ("loss_all", "loss_RoiTrans"):
        np.testing.assert_allclose(float(evs[True][k]), float(evs[False][k]),
                                   rtol=2e-5, err_msg=f"eval term {k}")


@pytest.mark.slow
def test_combined_transform_grads_float64():
    """Subprocess (x64 is process-global): the combined pass is
    mathematically identical to two passes — grads within 1e-6 of leaf
    max at float64 (see tests/combined_transform_driver.py)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable,
         os.path.join(repo, "tests", "combined_transform_driver.py")],
        capture_output=True, text=True, cwd=repo, env=env, timeout=900,
    )
    assert r.returncode == 0, f"driver failed:\n{r.stdout}\n{r.stderr}"
    assert "COMBINED_TRANSFORM_OK" in r.stdout, r.stdout


def test_eval_step_runs_and_matches_shapes(setup):
    model, state, (train_step, eval_step, push_step) = setup
    rng = np.random.default_rng(1)
    x, y, v = _batch(rng, n=3)
    m = eval_step(state.params, state.batch_stats, x, y, v, jax.random.PRNGKey(1))
    assert m["logits"].shape == (3, 4)
    assert m["similarities"].shape == (3, 8)
    assert np.isfinite(float(m["loss_all"]))


def test_push_step_outputs(setup):
    model, state, (train_step, eval_step, push_step) = setup
    rng = np.random.default_rng(2)
    x, y, v = _batch(rng, n=2)
    roi, dist, occ, logits = push_step(state.params, state.batch_stats, x)
    assert roi.shape == (2, 8, 64)
    assert dist.shape == (2, 8)
    assert (np.asarray(dist) >= -1e-6).all() and (np.asarray(dist) <= 1 + 1e-6).all()


def test_frozen_stage_keeps_backbone_params(setup):
    model, state, _ = setup
    bundle = LossBundle(CRITERION, num_classes=4, abstain_class=True)
    tx = make_adam(params=state.params)
    warm_step, _, _ = make_xprotonet_steps(model, bundle, tx,
                                           accumulation_steps=1, stage="warm",
                                           donate=False)
    rng = np.random.default_rng(3)
    x, y, v = _batch(rng)
    lrs = {g: jnp.float32(1e-3) for g in
           ("backbone", "add_on", "occurrence", "prototypes", "last_layer")}
    st = TrainState.create(state.params, state.batch_stats, tx)
    new_st, _ = warm_step(st, x, y, v, jax.random.PRNGKey(0), lrs)
    bb_before = jax.tree_util.tree_leaves(st.params["cnn_backbone"])[0]
    bb_after = jax.tree_util.tree_leaves(new_st.params["cnn_backbone"])[0]
    np.testing.assert_array_equal(np.asarray(bb_before), np.asarray(bb_after))
    ao_before = jax.tree_util.tree_leaves(st.params["add_on_layers"])[0]
    ao_after = jax.tree_util.tree_leaves(new_st.params["add_on_layers"])[0]
    assert np.abs(np.asarray(ao_before) - np.asarray(ao_after)).max() > 0


@pytest.mark.slow
def test_sharded_train_step_on_mesh(setup):
    """Data-parallel: batch sharded over 8 CPU devices, params replicated.

    slow-marked: GSPMD-partitioning the full 7-term train step costs
    ~100 s on this 1-core host even with a warm compile cache, and the
    driver's dryrun_multichip contract check executes this same DP leg
    every round; the fast loop keeps mesh coverage via
    test_push_prototypes_sharded_mesh."""
    model, state, (train_step, eval_step, push_step) = setup
    from protoasnet_tpu.parallel import make_mesh, replicate, batch_sharding

    mesh = make_mesh()
    assert mesh.devices.size == 8
    rng = np.random.default_rng(4)
    x, y, v = _batch(rng, n=8)
    sharding = batch_sharding(mesh)
    x = jax.device_put(x, sharding)
    y = jax.device_put(y, sharding)
    v = jax.device_put(v, sharding)
    st = jax.device_put(state, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
    lrs = {g: jnp.float32(1e-4) for g in
           ("backbone", "add_on", "occurrence", "prototypes", "last_layer")}
    new_st, m = train_step(st, x, y, v, jax.random.PRNGKey(0), lrs)
    assert np.isfinite(float(m["loss_all"]))
    assert m["logits"].shape == (8, 4)


@pytest.mark.slow
def test_hybrid_dp_tp_mesh(setup):
    """2-D (data, model) mesh: prototype dimension sharded over 'model'.

    slow-marked: the GSPMD partitioning compile of the full train step
    costs ~1.5-3 min on this 1-core host even with a warm cache, and the
    driver's dryrun_multichip contract check executes this same leg every
    round; the fast loop keeps the 1-D DP mesh test."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from protoasnet_tpu.parallel.mesh import make_mesh_2d, prototype_param_shardings
    from protoasnet_tpu.train.steps import TrainState
    from protoasnet_tpu.train.optim import make_adam

    model, state, (train_step, eval_step, push_step) = setup
    mesh = make_mesh_2d(4, 2)
    p_shard = prototype_param_shardings(state.params, mesh)
    # prototype rows sharded over model axis
    assert p_shard["prototype_vectors"].spec == P("model")
    assert p_shard["last_layer"]["Dense_0"]["kernel"].spec == P("model")
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))
    st = state.replace(
        params=jax.tree_util.tree_map(jax.device_put, state.params, p_shard),
        batch_stats=jax.device_put(state.batch_stats, repl),
        opt_state=jax.device_put(state.opt_state, repl),
        acc=jax.device_put(state.acc, repl),
    )
    rng = np.random.default_rng(7)
    x, y, v = _batch(rng, n=8)
    x, y, v = (jax.device_put(a, data_sh) for a in (x, y, v))
    lrs = {g: jnp.float32(1e-4) for g in
           ("backbone", "add_on", "occurrence", "prototypes", "last_layer")}
    new_st, m = train_step(st, x, y, v, jax.random.PRNGKey(0), lrs)
    assert np.isfinite(float(m["loss_all"]))


def test_frozen_stage_no_weight_decay_drift(setup):
    """Weight decay alone must not move frozen groups: during warm stage the
    backbone and last_layer are frozen, but the torch-style wd hook sees all
    params — without masking, Adam turns wd*p into a ~sign(p)*lr drift."""
    model, state, _ = setup
    bundle = LossBundle(CRITERION, num_classes=4, abstain_class=True)
    tx = make_adam(weight_decay_by_group={g: 1e-3 for g in
                                          ("backbone", "add_on", "occurrence",
                                           "last_layer")},
                   params=state.params)
    warm_step, _, _ = make_xprotonet_steps(model, bundle, tx,
                                           accumulation_steps=1, stage="warm",
                                           donate=False)
    rng = np.random.default_rng(5)
    lrs = {g: jnp.float32(1e-3) for g in
           ("backbone", "add_on", "occurrence", "prototypes", "last_layer")}
    st = TrainState.create(state.params, state.batch_stats, tx)
    key = jax.random.PRNGKey(0)
    new_st = st
    for _ in range(3):
        x, y, v = _batch(rng)
        key, sub = jax.random.split(key)
        new_st, _ = warm_step(new_st, x, y, v, sub, lrs)
    for grp in ("cnn_backbone", "last_layer"):
        before = jax.tree_util.tree_leaves(st.params[grp])
        after = jax.tree_util.tree_leaves(new_st.params[grp])
        for b_leaf, a_leaf in zip(before, after):
            np.testing.assert_array_equal(np.asarray(b_leaf), np.asarray(a_leaf))
    # frozen leaves keep exactly-zero Adam moments (chain: (wd, scale_by_adam))
    adam_state = new_st.opt_state[1]
    for mom in (adam_state.mu, adam_state.nu):
        for leaf in jax.tree_util.tree_leaves(mom["cnn_backbone"]):
            assert (np.asarray(leaf) == 0).all()


@pytest.mark.slow
def test_fsdp_param_shardings_on_mesh(setup):
    """FSDP/ZeRO-3-style: large params shard their biggest data-divisible
    dim over the data axis; the jitted step runs unchanged (GSPMD inserts
    the all-gathers) and small leaves stay replicated.

    slow-marked: see test_hybrid_dp_tp_mesh (dryrun_multichip runs the
    DP+FSDP leg every round)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from protoasnet_tpu.parallel import batch_sharding, make_mesh
    from protoasnet_tpu.parallel.mesh import (fsdp_param_shardings,
                                              opt_state_shardings)
    from protoasnet_tpu.train.optim import GradAccumulator

    model, state, (train_step, _, _) = setup
    mesh = make_mesh()
    fsdp = fsdp_param_shardings(state.params, mesh, min_size=1 << 10)
    specs = jax.tree_util.tree_map(lambda s: s.spec, fsdp)
    flat = jax.tree_util.tree_leaves(specs, is_leaf=lambda s: isinstance(s, P))
    assert any(sp != P() for sp in flat), "nothing sharded"
    # every sharded leaf's dim is divisible by the mesh size
    for leaf, sh in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(
                            fsdp, is_leaf=lambda s: isinstance(s, NamedSharding))):
        for dim, name in zip(leaf.shape, sh.spec + (None,) * leaf.ndim):
            if name == "data":
                assert dim % 8 == 0

    put = jax.tree_util.tree_map
    repl = NamedSharding(mesh, P())
    # Adam mu/nu shard with the params (the ZeRO-3 memory win covers the
    # 2x optimizer state, not just the weights); counts replicate
    opt_sh = opt_state_shardings(state.opt_state, state.params, fsdp, mesh)
    adam_sh = opt_sh[1]  # chain: (wd EmptyState, ScaleByAdamState)
    assert any(s.spec != P() for s in jax.tree_util.tree_leaves(
        adam_sh.mu, is_leaf=lambda s: isinstance(s, NamedSharding)))
    st = state.replace(
        params=put(jax.device_put, state.params, fsdp),
        acc=GradAccumulator(acc=put(jax.device_put, state.acc.acc, fsdp),
                            count=jax.device_put(state.acc.count, repl)),
        batch_stats=jax.device_put(state.batch_stats, repl),
        opt_state=put(jax.device_put, state.opt_state, opt_sh),
    )
    rng = np.random.default_rng(5)
    x, y, v = _batch(rng, n=8)
    sharding = batch_sharding(mesh)
    x, y, v = (jax.device_put(a, sharding) for a in (x, y, v))
    lrs = {g: jnp.float32(1e-4) for g in
           ("backbone", "add_on", "occurrence", "prototypes", "last_layer")}
    new_st, m = train_step(st, x, y, v, jax.random.PRNGKey(0), lrs)
    assert np.isfinite(float(m["loss_all"]))
    # parity with the replicated run: same batch, same init -> same loss
    st_r = jax.device_put(state, repl)
    _, m_r = train_step(st_r, x, y, v, jax.random.PRNGKey(0), lrs)
    np.testing.assert_allclose(float(m["loss_all"]), float(m_r["loss_all"]),
                               rtol=2e-5)


def test_maybe_initialize_distributed_single_host_noop(monkeypatch):
    """Single host / no coordinator env -> returns False without touching
    jax.distributed. With the env set, initialize() must actually be
    called; if it FAILS on a still-single process the helper must raise
    (silent fallback to N independent single-host runs is the bug the
    round-2 advisor flagged), and once initialized it must not re-call."""
    import pytest as _pytest

    from protoasnet_tpu.parallel import mesh as mesh_mod
    from protoasnet_tpu.parallel.mesh import maybe_initialize_distributed

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert maybe_initialize_distributed() is False

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "127.0.0.1:1234")
    monkeypatch.setitem(mesh_mod._DIST, "done", False)

    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: calls.append(1))
    out = maybe_initialize_distributed()
    assert calls, "initialize() not attempted with coordinator env set"
    assert out is False  # still one process in this test
    # successful init is recorded: a second call must not re-initialize
    maybe_initialize_distributed()
    assert len(calls) == 1

    # failure on a single process with multi-process requested -> raise
    def boom(*a, **k):
        raise RuntimeError("must be called before any JAX calls")

    monkeypatch.setitem(mesh_mod._DIST, "done", False)
    monkeypatch.setattr(jax.distributed, "initialize", boom)
    with _pytest.raises(RuntimeError, match="refusing to fall back"):
        maybe_initialize_distributed()
