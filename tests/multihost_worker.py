"""Worker process for the 2-process multi-host integration test
(tests/test_multihost.py). Each worker: jax.distributed.initialize over
localhost (gloo), 4 virtual CPU devices -> 8-device global mesh, then

1. one DP train step on a global mesh with its LOCAL half of the batch,
2. one cross-process score-matrix build (build_multihost) on its LOCAL
   mesh, chunk files into a shared dir, process 0 combines.

Writes result_<pid>.json (+ mh_scores.npy from process 0) for the
parent test to compare against the single-process reference values.
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")

port, pid, n_proc, outdir = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=n_proc, process_id=pid
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from anncur_tpu.config import Config
from anncur_tpu.data.synthetic import make_tokenized_world
from anncur_tpu.indexer.score_matrix import ScoreMatrixBuilder
from anncur_tpu.models.bert import BertSpec
from anncur_tpu.models.biencoder import BiEncoder
from anncur_tpu.models.crossencoder import CrossEncoder
from anncur_tpu.parallel.mesh import make_mesh
from anncur_tpu.parallel.multihost import barrier, global_mesh
from anncur_tpu.train.trainer import Trainer

assert jax.process_count() == n_proc and len(jax.devices()) == 4 * n_proc

ment, ent, gt, tok = make_tokenized_world(
    seed=3, n_ents=24, n_ments=32, max_ment_len=16, max_ent_len=16
)
spec = BertSpec.tiny(
    vocab_size=tok.vocab_size, hidden_size=32, num_layers=1, num_heads=2,
    intermediate_size=64,
)

# ---- 1. one DP train step over the process-spanning mesh -------------- #
enc = BiEncoder(spec=spec, pooling_type="cls", embed_dim=32, compute_dtype=jnp.float32)
cfg = Config(
    base_res_dir=outdir, model_type="bi_enc", loss_type="ce",
    train_batch_size=16, grad_acc_steps=2, num_negs=3, neg_strategy="random",
    learning_rate=5e-4,
)
mesh = global_mesh()
trainer = Trainer(cfg, enc, mesh=mesh, total_steps=4)
state = trainer.init_state()
step = trainer.make_train_step()

# global batch (identical on every process), local slice along the MICRO
# dim: global (16, L) -> (acc=2, micro=8, L); this process owns micro
# columns [4*pid, 4*pid+4)
g_inp = np.asarray(ment[:16], np.int32)
g_pos = np.asarray(ent[gt[:16]], np.int32)


def local_half(g):
    acc = g.reshape(2, 8, *g.shape[1:])
    return acc[:, 4 * pid : 4 * (pid + 1)].reshape(8, *g.shape[1:])


sharded = trainer._shard_batch({"input": local_half(g_inp), "pos": local_half(g_pos)})
state, metrics = step(state, sharded)
loss = float(metrics["loss"])
checksum = float(
    sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(state.params))
)

# ---- 2. cross-process offline build on LOCAL meshes ------------------- #
ce = CrossEncoder(
    spec=BertSpec.tiny(vocab_size=tok.vocab_size, max_position_embeddings=64),
    compute_dtype=jnp.float32,
)
ce_params = ce.init(jax.random.PRNGKey(0))
local_mesh = make_mesh((len(jax.local_devices()),), ("data",), devices=jax.local_devices())
builder = ScoreMatrixBuilder(ce, local_mesh, ment_block=4, ent_block=8, pair_pad_multiple=32)
scores = builder.build_multihost(
    ce_params, ment[:10], ent, chunk_dir=os.path.join(outdir, "chunks"), chunk_rows=4
)
if pid == 0:
    assert scores is not None and scores.shape == (10, 24)
    np.save(os.path.join(outdir, "mh_scores.npy"), scores)
else:
    assert scores is None

# ---- 3. checkpoint (process-0-only) + multi-host resume placement ----- #
# the exact restore sequence Trainer.train(resume=True) runs: host
# leaves from load_pytree -> _place_like re-replicates over the global
# mesh (host-numpy leaves used to crash the first resumed step)
import dataclasses

from anncur_tpu.train.checkpoint import load_pytree

if pid == 0:
    trainer._ckpt.save_end_of_epoch(
        {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": int(state.step),
            "rng": state.rng,
        },
        0,
        int(state.step),
    )
barrier("ckpt_saved")
last = trainer._ckpt.latest_eoe()
assert last is not None, "process could not see the shared checkpoint"
tree, _ = load_pytree(last["path"])
fresh = trainer.init_state()
restored = dataclasses.replace(
    fresh,
    params=tree["params"],
    opt_state=tree["opt_state"],
    step=jnp.asarray(tree["step"], jnp.int32),
    rng=tree.get("rng", fresh.rng),
)
placed = trainer._place_like(fresh, restored)
f_leaf = jax.tree_util.tree_leaves(fresh.params)[0]
p_leaf = jax.tree_util.tree_leaves(placed.params)[0]
assert p_leaf.sharding.is_equivalent_to(f_leaf.sharding, p_leaf.ndim), (
    p_leaf.sharding, f_leaf.sharding,
)
placed, m2 = step(placed, sharded)  # first resumed step on a global batch
resume_loss = float(m2["loss"])

with open(os.path.join(outdir, f"result_{pid}.json"), "w") as f:
    json.dump({"loss": loss, "checksum": checksum, "resume_loss": resume_loss}, f)
barrier("test_done")
print(f"worker {pid} OK loss={loss}")
