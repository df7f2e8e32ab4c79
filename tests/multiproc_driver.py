"""Two-process DCN-path driver (launched by tests/test_multiprocess.py).

Each process owns 4 virtual CPU devices; `jax.distributed.initialize`
handshakes through a localhost coordinator (gloo CPU collectives), the
8-device `data` mesh spans both processes, and `global_batch_from_local`
assembles global arrays from each process's LOCAL batch half
(jax.make_array_from_process_local_data) — the exact code path a real
multi-host TPU pod uses (parallel/mesh.py:150-163, SURVEY.md §5.8).

Usage: multiproc_driver.py <process_id> <num_processes> <coordinator>
Prints "LOSS <value>" so the test can compare against the single-process
8-device run of the same global batch.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PID, NPROC, COORD = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
LOCAL_DEVICES = 4

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", "")
    + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_COORDINATOR_ADDRESS"] = COORD
os.environ["JAX_NUM_PROCESSES"] = str(NPROC)
os.environ["JAX_PROCESS_ID"] = str(PID)

import jax

jax.config.update("jax_platforms", "cpu")

from protoasnet_tpu.parallel import maybe_initialize_distributed

# MUST run before any other JAX API use (backend comes up during the
# coordinator handshake)
assert maybe_initialize_distributed(), "distributed init did not engage"
assert jax.process_count() == NPROC, jax.process_count()
assert jax.local_device_count() == LOCAL_DEVICES

import jax.numpy as jnp
import numpy as np

from protoasnet_tpu.losses.bundle import LossBundle
from protoasnet_tpu.models.builder import build_model, init_model
from protoasnet_tpu.parallel import make_mesh, replicate
from protoasnet_tpu.parallel.mesh import global_batch_from_local
from protoasnet_tpu.train.optim import GROUPS, make_adam
from protoasnet_tpu.train.steps import TrainState, make_xprotonet_steps
from tests.test_multiprocess import CRITERION, global_batch, tiny_model_cfg

model = build_model(tiny_model_cfg())
xg, yg, vg = global_batch()  # the full deterministic global batch
params, batch_stats = init_model(model, jnp.asarray(xg[:1]), seed=0)
bundle = LossBundle(CRITERION, num_classes=4, abstain_class=True)
tx = make_adam(weight_decay_by_group={g: 1e-3 for g in GROUPS},
               params=params)
train_step, _, _ = make_xprotonet_steps(model, bundle, tx,
                                        accumulation_steps=1, stage="all",
                                        donate=False)

mesh = make_mesh()  # 8 global devices across the 2 processes
assert mesh.devices.size == NPROC * LOCAL_DEVICES
state = TrainState.create(params, batch_stats, tx)
state = replicate(mesh, state)

# each process feeds ONLY its local half of the global batch
lo, hi = PID * (len(xg) // NPROC), (PID + 1) * (len(xg) // NPROC)
local = {"cine": xg[lo:hi], "target_AS": yg[lo:hi], "valid": vg[lo:hi]}
gb = global_batch_from_local(mesh, local)
assert gb["cine"].shape[0] == len(xg)  # global shape, local shards

lrs = {g: jnp.float32(1e-4) for g in GROUPS}
new_state, metrics = train_step(state, gb["cine"], gb["target_AS"],
                                gb["valid"], jax.random.PRNGKey(0), lrs)
loss = float(metrics["loss_all"])
# a second chained step proves the updated (sharded) state stays usable
new_state, metrics2 = train_step(new_state, gb["cine"], gb["target_AS"],
                                 gb["valid"], jax.random.PRNGKey(1), lrs)
print(f"LOSS {loss:.10f} {float(metrics2['loss_all']):.10f}", flush=True)

# --- uneven final batch: 6 real samples padded to 8, the padding masked
# by valid=False (every epoch's last batch looks like this; the pad rows
# repeat real data exactly like data/dataset.py:335-337). Same jitted
# program (valid is an input), fresh replicated state.
from tests.test_multiprocess import padded_global_batch

xp, yp, vp = padded_global_batch()
lo, hi = PID * (len(xp) // NPROC), (PID + 1) * (len(xp) // NPROC)
gbp = global_batch_from_local(
    mesh, {"cine": xp[lo:hi], "target_AS": yp[lo:hi], "valid": vp[lo:hi]})
_, mp = train_step(state, gbp["cine"], gbp["target_AS"], gbp["valid"],
                   jax.random.PRNGKey(0), lrs)
print(f"PADLOSS {float(mp['loss_all']):.10f}", flush=True)

# --- FSDP / ZeRO-3: params + Adam moments + grad accumulators sharded
# over the SAME cross-process data axis (GSPMD all-gathers on use, the
# gather/scatter collectives now ride the gloo DCN path). Step-1 loss on
# fresh state must equal the DP step-1 loss above — sharding placement
# must not change the math.
from protoasnet_tpu.parallel.mesh import fsdp_param_shardings, opt_state_shardings
from protoasnet_tpu.train.optim import GradAccumulator
from jax.sharding import NamedSharding, PartitionSpec as P

repl = NamedSharding(mesh, P())
fsdp = fsdp_param_shardings(params, mesh, min_size=1 << 10)
state_f = TrainState.create(params, batch_stats, tx)
opt_sh = opt_state_shardings(state_f.opt_state, params, fsdp, mesh)
put = jax.tree_util.tree_map
state_f = state_f.replace(
    params=put(jax.device_put, state_f.params, fsdp),
    acc=GradAccumulator(acc=put(jax.device_put, state_f.acc.acc, fsdp),
                        count=jax.device_put(state_f.acc.count, repl)),
    batch_stats=jax.device_put(state_f.batch_stats, repl),
    opt_state=put(jax.device_put, state_f.opt_state, opt_sh),
)
stf, mf = train_step(state_f, gb["cine"], gb["target_AS"], gb["valid"],
                     jax.random.PRNGKey(0), lrs)
print(f"FSDPLOSS {float(mf['loss_all']):.10f}", flush=True)
jax.distributed.shutdown()
