import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from protoasnet_tpu.train.optim import (
    GradAccumulator,
    ReduceLROnPlateau,
    accumulate_and_maybe_update,
    make_adam,
)


def test_adam_matches_torch_with_weight_decay():
    """Our chain (wd-add + scale_by_adam, lr applied outside) must track
    torch.optim.Adam(weight_decay=1e-3) on a quadratic."""
    w0 = np.array([1.0, -2.0, 3.0], np.float32)
    lr, wd = 0.01, 1e-3

    wt = torch.tensor(w0, requires_grad=True)
    opt = torch.optim.Adam([wt], lr=lr, weight_decay=wd)

    params = {"w": jnp.asarray(w0)}
    tx = make_adam(weight_decay_by_group={"backbone": wd}, params=params)
    # label tree: everything falls into "backbone" by default
    opt_state = tx.init(params)

    for step in range(5):
        # grad of 0.5*||w||^2 -> w
        gt = wt.detach().clone()
        opt.zero_grad()
        loss = 0.5 * (wt**2).sum()
        loss.backward()
        opt.step()

        grads = {"w": params["w"]}
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p - lr * u, params, updates)

        np.testing.assert_allclose(
            np.asarray(params["w"]), wt.detach().numpy(), rtol=1e-5, atol=1e-6
        )


def test_grad_accumulation_sums():
    """Accumulated update after k micro-batches equals one update with the
    SUMMED gradient (reference loss.backward() x k semantics)."""
    params = {"w": jnp.ones(4)}
    tx = make_adam(params=params)
    g1 = {"w": jnp.full(4, 0.5)}
    g2 = {"w": jnp.full(4, 1.5)}

    # path A: accumulate two micro grads, every=2
    acc = GradAccumulator.init(params)
    opt_state = tx.init(params)
    upd, acc, opt_state, applied = accumulate_and_maybe_update(
        tx, g1, acc, opt_state, params, every=2
    )
    assert not bool(applied)
    assert float(jnp.abs(upd["w"]).sum()) == 0.0
    upd, acc, opt_state, applied = accumulate_and_maybe_update(
        tx, g2, acc, opt_state, params, every=2
    )
    assert bool(applied)

    # path B: single update with summed grads
    opt_state_b = tx.init(params)
    g_sum = {"w": g1["w"] + g2["w"]}
    upd_b, _ = tx.update(g_sum, opt_state_b, params)
    np.testing.assert_allclose(np.asarray(upd["w"]), np.asarray(upd_b["w"]),
                               rtol=1e-6)
    # accumulator reset
    assert float(jnp.abs(acc.acc["w"]).sum()) == 0.0
    assert int(acc.count) == 0


def test_reduce_lr_on_plateau_matches_torch():
    torch_w = torch.nn.Parameter(torch.zeros(1))
    topt = torch.optim.Adam([torch_w], lr=0.1)
    tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        topt, mode="max", factor=0.5, patience=2, threshold=1e-4,
        cooldown=1, min_lr=1e-3,
    )
    ours = ReduceLROnPlateau(0.1, mode="max", factor=0.5, patience=2,
                             threshold=1e-4, cooldown=1, min_lr=1e-3)
    metrics = [0.5, 0.6, 0.6, 0.6, 0.6, 0.6, 0.61, 0.61, 0.61, 0.61, 0.61, 0.61]
    for m in metrics:
        tsched.step(m)
        lr_ours = ours.step(m)
        lr_torch = topt.param_groups[0]["lr"]
        assert lr_ours == pytest.approx(lr_torch), f"metric {m}"


def test_stage_masks():
    from protoasnet_tpu.train.optim import trainable_mask

    params = {
        "cnn_backbone": {"conv": jnp.zeros(1)},
        "add_on_layers": {"k": jnp.zeros(1)},
        "occurrence_module": {"k": jnp.zeros(1)},
        "prototype_vectors": jnp.zeros(1),
        "last_layer": {"Dense_0": {"kernel": jnp.zeros(1)}},
    }
    warm = trainable_mask(params, "warm")
    assert warm["cnn_backbone"]["conv"] is False
    assert warm["prototype_vectors"] is True
    assert warm["last_layer"]["Dense_0"]["kernel"] is False
    last = trainable_mask(params, "last")
    assert last["last_layer"]["Dense_0"]["kernel"] is True
    assert last["add_on_layers"]["k"] is False


def test_sparsity_matches_torch_metric():
    from protoasnet_tpu.train.metrics import sparsity_count

    sims = np.random.default_rng(0).uniform(0.01, 1, size=(10, 16)).astype(np.float32)
    ours = sparsity_count(sims, 0.8)
    t = torch.tensor(sims)
    norm = t / t.sum(dim=1).unsqueeze(-1)
    srt, _ = torch.sort(norm, descending=True, dim=1)
    cumsum = torch.cumsum(srt, dim=1)
    ref = torch.ge(cumsum, 0.8).type(torch.uint8).argmax(dim=1).numpy()
    np.testing.assert_array_equal(ours, ref)
