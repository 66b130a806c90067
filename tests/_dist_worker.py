"""Worker for the live 2-process distributed test (launched by
test_multiprocess_live.py).  Runs real jax.distributed paths that replace
the reference's torchrun/NCCL semantics (utils/utils.py:18-27,
base_trainer.py:117,143-159) and writes results to a JSON file.

Usage: python _dist_worker.py <coordinator> <num_procs> <proc_id> <outdir>
"""

import json
import os
import sys

coordinator, num_procs, proc_id, outdir = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=coordinator,
                           num_processes=num_procs, process_id=proc_id)

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdae_tpu.data.pipeline import prefetch_to_device
from pdae_tpu.parallel import (dispatch_num_samples_for_process,
                               gather_objects, is_primary, make_mesh,
                               process_count, sync_global_devices)

out = {"process_id": proc_id}
out["process_count"] = process_count()
out["local_device_count"] = jax.local_device_count()
out["global_device_count"] = len(jax.devices())

# --- ragged host-object all-gather (reference all_gather_object) --------- #
local_payload = (["alpha", 1, {"k": [2, 3]}] if proc_id == 0
                 else [{"beta": proc_id}])
gathered = gather_objects(local_payload)
out["gather_objects"] = repr(gathered)

# --- sampler work dispatch (reference dispatch_num_samples_for_process) -- #
out["dispatch_7"] = dispatch_num_samples_for_process(7)

# --- global-batch train step over the 8-device mesh --------------------- #
# per-process local batch -> make_array_from_process_local_data -> jitted
# loss over the GLOBAL batch; the logged loss must be the cross-rank
# average by construction (replaces reference gather_data loss averaging,
# train_regular_diffusion.py:125-130)
mesh = make_mesh()
batch_sharding = NamedSharding(mesh, P("data"))
repl = NamedSharding(mesh, P())

LOCAL_B, DIM = 8, 16
rs = np.random.RandomState(100 + proc_id)
local_x = rs.randn(LOCAL_B, DIM).astype(np.float32)
w = jnp.asarray(np.random.RandomState(7).randn(DIM, 1).astype(np.float32))
w = jax.device_put(w, repl)

it = prefetch_to_device(iter([{"x": local_x}]), size=1,
                        sharding=batch_sharding)
batch = next(it)
out["global_batch_shape"] = list(batch["x"].shape)


@jax.jit
def loss_and_grad(w, x):
    def loss_fn(w):
        return jnp.mean((x @ w) ** 2)
    return jax.value_and_grad(loss_fn)(w)


loss, grad = loss_and_grad(w, batch["x"])
out["global_loss"] = float(loss)
out["grad_norm"] = float(jnp.linalg.norm(grad))

# numpy cross-check: global loss over the CONCATENATED per-process batches
all_x = np.concatenate([np.random.RandomState(100 + r).randn(
    LOCAL_B, DIM).astype(np.float32) for r in range(num_procs)])
out["numpy_global_loss"] = float(np.mean((all_x @ np.asarray(w)) ** 2))

# --- per-process eval compute on _eval_local copies ---------------------- #
# trainer evaluate() shards eval work with DIFFERENT shapes per process
# (even zero on some ranks); jitting over the GLOBAL replicated params
# would be a collective and deadlock.  _eval_local() copies them
# process-local first -- verify the whole pattern completes with
# divergent shapes across ranks.
from pdae_tpu.training.base import BaseTrainer

w_local = BaseTrainer._eval_local(object(), w)
local_n_eval = 3 if proc_id == 0 else 2


@jax.jit
def eval_fn(w, x):
    return jnp.tanh(x @ w)


eval_out = eval_fn(jnp.asarray(w_local),
                   jnp.ones((local_n_eval, DIM), jnp.float32))
out["eval_local_shape"] = list(eval_out.shape)

# --- primary-gated eval gather (BaseTrainer._gather_eval_images) -------- #

local_n = dispatch_num_samples_for_process(5)
offset = sum(dispatch_num_samples_for_process(5, rank=r)
             for r in range(proc_id))
local_imgs = np.full((local_n, 2, 2, 3), proc_id, np.float32)
merged = BaseTrainer._gather_eval_images(object(), local_imgs)
out["eval_gather"] = (None if merged is None
                      else [list(merged.shape),
                            [float(v) for v in merged[:, 0, 0, 0]]])
out["is_primary"] = is_primary()
out["eval_shard"] = [local_n, offset]

# --- chunked (steps_per_dispatch) global batches -------------------------- #
# stacked [K, B_local, ...] host chunks -> global [K, B_local*world, ...]
# arrays sharded on dim 1 (training/base.py:_chunked_batch_iterator)
chunk_sharding = NamedSharding(mesh, P(None, "data"))
chunk_local = np.stack([local_x, local_x + 1.0])      # K=2
cit = prefetch_to_device(iter([{"x": chunk_local}]), size=1,
                         sharding=chunk_sharding)
chunk = next(cit)["x"]
out["chunk_global_shape"] = list(chunk.shape)


@jax.jit
def chunk_loss(x):
    return jnp.mean(x ** 2, axis=(1, 2))   # per-chunk-step loss, shape [K]


out["chunk_losses"] = [float(v) for v in chunk_loss(chunk)]

# --- FSDP param sharding across processes -------------------------------- #
# params sharded over the GLOBAL mesh (each process holds only its shards);
# a jitted step keeps the sharding (out_shardings), and the trainer's
# save/eval paths recover full host copies via process_allgather.
from functools import partial

from pdae_tpu.parallel import fsdp_shardings, shard_tree_fsdp

fp = {"w": jnp.asarray(np.random.RandomState(3).randn(32, DIM)
                       .astype(np.float32))}
fp = shard_tree_fsdp(mesh, fp, min_size=64)
fsh = fsdp_shardings(mesh, fp, min_size=64)
out["fsdp_w_sharded"] = not fp["w"].sharding.is_fully_replicated


@partial(jax.jit, donate_argnums=0, out_shardings=fsh)
def fsdp_step(p):
    return jax.tree_util.tree_map(lambda a: a * 0.5, p)


fp = fsdp_step(fp)
out["fsdp_w_still_sharded"] = not fp["w"].sharding.is_fully_replicated

# save path: every process gathers, primary would write (BaseTrainer.save)
from pdae_tpu.parallel import host_copy_tree

host_tree = host_copy_tree(fp)
out["fsdp_gather_shape"] = list(np.shape(host_tree["w"]))
out["fsdp_gather_sum"] = float(np.sum(host_tree["w"]))

# shared-leaf dedup: the same sharded array referenced twice (like the
# frozen trunk inside 'decoder' and 'ema_decoder') gathers once and both
# copies come back equal
shared = host_copy_tree({"a": fp["w"], "b": fp["w"],
                         "meta": np.int32(7)})
out["fsdp_dedup_equal"] = bool(np.array_equal(shared["a"], shared["b"]))
out["fsdp_dedup_meta"] = int(shared["meta"])

# eval path: _eval_local with an fsdp-mode trainer stub
stub = type("S", (), {"param_sharding": "fsdp"})()
w_eval = BaseTrainer._eval_local(stub, fp)
out["fsdp_eval_local_shape"] = list(np.shape(w_eval["w"]))

# --- hierarchical [dcn, ici] mesh: FSDP that stays host-local ------------ #
# the auto layout puts one mesh row per process; params shard over 'ici'
# only, so every process holds a COMPLETE copy of each leaf across its own
# devices (param all-gathers never cross the slow DCN axis), while the
# batch shards over both axes
from pdae_tpu.parallel import ICI_AXIS, make_hier_mesh, mesh_data_axes

hmesh = make_hier_mesh()
out["hier_mesh_shape"] = [hmesh.shape["dcn"], hmesh.shape["ici"]]
out["hier_data_axes"] = list(mesh_data_axes(hmesh))

hbatch_sh = NamedSharding(hmesh, P(mesh_data_axes(hmesh)))
hit = prefetch_to_device(iter([{"x": local_x}]), size=1, sharding=hbatch_sh)
hbatch = next(hit)
out["hier_global_batch_shape"] = list(hbatch["x"].shape)

hp = shard_tree_fsdp(hmesh, {"w": jnp.asarray(
    np.random.RandomState(3).randn(32, DIM).astype(np.float32))},
    axis_name=ICI_AXIS, min_size=64)
hsh = fsdp_shardings(hmesh, hp, axis_name=ICI_AXIS, min_size=64)
out["hier_w_sharded"] = not hp["w"].sharding.is_fully_replicated
# host-local completeness: this process's addressable shards reconstruct
# the full leaf (no cross-host fetch needed for a param gather)
covered = np.zeros((32, DIM), bool)
for s in hp["w"].addressable_shards:
    covered[s.index] = True
out["hier_w_host_complete"] = bool(covered.all())


@partial(jax.jit, donate_argnums=0, out_shardings=(hsh, None))
def hier_step(p, x):
    loss = jnp.mean((x @ p["w"].T) ** 2)
    return jax.tree_util.tree_map(lambda a: a * 0.5, p), loss


hp, hloss = hier_step(hp, hbatch["x"])
out["hier_loss"] = float(hloss)
out["hier_w_still_sharded"] = not hp["w"].sharding.is_fully_replicated

# --- tensor parallelism across live processes ----------------------------- #
# make_tp_mesh(4) over 2 procs x 4 devices: data axis spans the processes
# (one row each), model axis is each process's 4 local devices.  Params
# channel-shard over 'model'; the batch shards over 'data' only.
from pdae_tpu.parallel import make_tp_mesh, shard_tree_tp, tp_shardings

tmesh = make_tp_mesh(4)
out["tp_mesh_shape"] = [tmesh.shape["data"], tmesh.shape["model"]]
out["tp_data_axes"] = list(mesh_data_axes(tmesh))

tbatch_sh = NamedSharding(tmesh, P(mesh_data_axes(tmesh)))
tit = prefetch_to_device(iter([{"x": local_x}]), size=1, sharding=tbatch_sh)
tbatch = next(tit)
out["tp_global_batch_shape"] = list(tbatch["x"].shape)

tp = shard_tree_tp(tmesh, {"w": jnp.asarray(
    np.random.RandomState(3).randn(32, DIM).astype(np.float32))},
    min_size=64)
tsh = tp_shardings(tmesh, tp, min_size=64)
out["tp_w_sharded"] = not tp["w"].sharding.is_fully_replicated
out["tp_w_spec_axes"] = sorted({a for e in tp["w"].sharding.spec if e
                                for a in ((e,) if isinstance(e, str)
                                          else tuple(e))})


@partial(jax.jit, donate_argnums=0, out_shardings=(tsh, None))
def tp_step(p, x):
    loss = jnp.mean((x @ p["w"].T) ** 2)
    return jax.tree_util.tree_map(lambda a: a * 0.5, p), loss


tp, tloss = tp_step(tp, tbatch["x"])
out["tp_loss"] = float(tloss)
out["tp_w_still_sharded"] = not tp["w"].sharding.is_fully_replicated

# --- composed fsdp+tp across live processes ------------------------------- #
# the 2-D layout live: [data:2, model:4] mesh spanning both processes;
# each leaf channel-shards over 'model' AND row-shards over 'data'
# (fsdp_tp_shardings), so no single process holds a full copy of any
# large leaf; a donated jitted step keeps the 2-D sharding
from pdae_tpu.parallel import fsdp_tp_shardings

ftp = {"w": jnp.asarray(np.random.RandomState(3).randn(32, DIM)
                        .astype(np.float32))}
ftsh = fsdp_tp_shardings(tmesh, ftp, min_size=64)
ftp = jax.tree_util.tree_map(jax.device_put, ftp, ftsh)
ft_axes = sorted({a for e in ftp["w"].sharding.spec if e
                  for a in ((e,) if isinstance(e, str) else tuple(e))})
out["fsdp_tp_w_spec_axes"] = ft_axes


@partial(jax.jit, donate_argnums=0, out_shardings=(ftsh, None))
def ftp_step(p, x):
    loss = jnp.mean((x @ p["w"].T) ** 2)
    return jax.tree_util.tree_map(lambda a: a * 0.5, p), loss


ftp, ftloss = ftp_step(ftp, tbatch["x"])
out["fsdp_tp_loss"] = float(ftloss)
out["fsdp_tp_still_2d"] = sorted(
    {a for e in ftp["w"].sharding.spec if e
     for a in ((e,) if isinstance(e, str) else tuple(e))}) == ft_axes

# --- sharded checkpoint across live processes ----------------------------- #
# every process writes ONLY its replica-0 shards of the (globally
# FSDP-sharded) tree -- no gather collective on the data path -- then each
# process independently reassembles the full tree from the directory and
# must match the host_copy_tree gather taken above
from pdae_tpu.utils import (is_sharded_checkpoint, load_sharded_checkpoint,
                            save_sharded_checkpoint)

ckpt_dir = os.path.join(outdir, "sharded_ckpt")
save_sharded_checkpoint(ckpt_dir, {"w": fp["w"], "meta": np.int32(5)},
                        barrier=sync_global_devices)
sync_global_devices("sharded_ckpt_written")   # manifest durable on primary
out["sharded_ckpt_is_valid"] = is_sharded_checkpoint(ckpt_dir)
raw = load_sharded_checkpoint(ckpt_dir)
out["sharded_ckpt_shape"] = list(np.shape(raw["w"]))
out["sharded_ckpt_sum"] = float(np.sum(raw["w"]))
out["sharded_ckpt_meta"] = int(raw["meta"])
out["sharded_ckpt_files"] = sorted(
    f for f in os.listdir(ckpt_dir) if f.startswith("shard-"))

# --- device-resident corpus across live processes ------------------------- #
# every process materializes the IDENTICAL corpus and places it with
# make_array_from_process_local_data on the replicated sharding (the
# multi-process branch of BaseTrainer._resident_device_data); indices are
# drawn from a process-invariant key inside jit, so each rank must see
# the SAME global batch (sum compared across ranks in the pytest side)
from pdae_tpu.training.resident import sample_batch

RN = 12
corpus = {"x_0": np.tile(
    np.arange(RN, dtype=np.float32)[:, None, None, None], (1, 2, 2, 1))}
rdata = jax.tree_util.tree_map(
    lambda x: jax.make_array_from_process_local_data(repl, x), corpus)
ridx_sh = NamedSharding(mesh, P("data"))


@jax.jit
def resident_draw(data):
    b = sample_batch(data, jax.random.fold_in(jax.random.PRNGKey(7), 3),
                     8, RN, index_sharding=ridx_sh)
    return jnp.sum(b["x_0"]), b["x_0"].shape[0]


rsum, rb = resident_draw(rdata)
out["resident_batch_sum"] = float(rsum)
out["resident_corpus_replicated"] = bool(
    rdata["x_0"].sharding.is_fully_replicated)

sync_global_devices("done")

with open(os.path.join(outdir, f"rank{proc_id}.json"), "w") as f:
    json.dump(out, f)
print("WORKER_OK", proc_id)
