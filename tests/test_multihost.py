"""Multi-host (DCN) execution: a REAL 2-process integration test.

Spawns two worker processes that jax.distributed.initialize over
localhost (gloo collectives), form an 8-device global mesh (4 virtual
CPU devices each), run one data-parallel train step feeding
process-local batch shards, and run a cross-process score-matrix build
(per-process mention ranges -> shared chunk dir -> process-0 combine).
The parent computes the same quantities single-process and asserts
equality — the multi-host path must be a pure scale-out.

Reference equivalents: multi-process DDP training
(models/pairwise_trainer.py:241-249) and SLURM mention-range chunking +
combiner (combine_chunked_computations.py:125-250).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anncur_tpu.config import Config
from anncur_tpu.data.synthetic import make_tokenized_world
from anncur_tpu.indexer.score_matrix import ScoreMatrixBuilder
from anncur_tpu.models.bert import BertSpec
from anncur_tpu.models.biencoder import BiEncoder
from anncur_tpu.models.crossencoder import CrossEncoder
from anncur_tpu.train.trainer import Trainer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def multihost_run(tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp("mh"))
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(p), "2", outdir],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for p in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    return outdir


def test_two_process_results_agree(multihost_run):
    res = [
        json.load(open(os.path.join(multihost_run, f"result_{p}.json")))
        for p in range(2)
    ]
    # SPMD: every process observes the same replicated loss and params
    assert np.isclose(res[0]["loss"], res[1]["loss"], rtol=1e-6)
    assert np.isclose(res[0]["checksum"], res[1]["checksum"], rtol=1e-6)
    # resume leg: process-0 checkpoint restored on BOTH processes via
    # _place_like (replicate_from_host), then one more global-mesh step
    assert np.isclose(res[0]["resume_loss"], res[1]["resume_loss"], rtol=1e-6)


def test_train_step_matches_single_process(multihost_run, mesh8, tmp_path):
    """The 2-process DP step on the same global batch must produce the
    single-process loss (pure scale-out, no semantic drift)."""
    ment, ent, gt, tok = make_tokenized_world(
        seed=3, n_ents=24, n_ments=32, max_ment_len=16, max_ent_len=16
    )
    spec = BertSpec.tiny(
        vocab_size=tok.vocab_size, hidden_size=32, num_layers=1, num_heads=2,
        intermediate_size=64,
    )
    enc = BiEncoder(spec=spec, pooling_type="cls", embed_dim=32, compute_dtype=jnp.float32)
    cfg = Config(
        base_res_dir=str(tmp_path), model_type="bi_enc", loss_type="ce",
        train_batch_size=16, grad_acc_steps=2, num_negs=3, neg_strategy="random",
        learning_rate=5e-4,
    )
    trainer = Trainer(cfg, enc, mesh=mesh8, total_steps=4)
    state = trainer.init_state()
    step = trainer.make_train_step()
    batch = trainer._shard_batch(
        {"input": np.asarray(ment[:16], np.int32), "pos": np.asarray(ent[gt[:16]], np.int32)}
    )
    _, metrics = step(state, batch)
    want = float(metrics["loss"])
    got = json.load(open(os.path.join(multihost_run, "result_0.json")))["loss"]
    assert np.isclose(got, want, rtol=1e-5, atol=1e-6), (got, want)


def test_multihost_build_matches_single_process(multihost_run, mesh8):
    ment, ent, gt, tok = make_tokenized_world(
        seed=3, n_ents=24, n_ments=32, max_ment_len=16, max_ent_len=16
    )
    ce = CrossEncoder(
        spec=BertSpec.tiny(vocab_size=tok.vocab_size, max_position_embeddings=64),
        compute_dtype=jnp.float32,
    )
    params = ce.init(jax.random.PRNGKey(0))
    builder = ScoreMatrixBuilder(ce, mesh8, ment_block=4, ent_block=8, pair_pad_multiple=32)
    want = builder(params, ment[:10], ent)
    got = np.load(os.path.join(multihost_run, "mh_scores.npy"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_build_multihost_rejects_global_mesh(mesh8, tmp_path):
    """Guard: build_multihost requires a process-local mesh. With a
    single process every mesh is local, so exercise the error path by
    faking a remote device via the validation logic."""
    ment, ent, gt, tok = make_tokenized_world(
        seed=3, n_ents=8, n_ments=4, max_ment_len=8, max_ent_len=8
    )
    ce = CrossEncoder(
        spec=BertSpec.tiny(vocab_size=tok.vocab_size, max_position_embeddings=32),
        compute_dtype=jnp.float32,
    )
    params = ce.init(jax.random.PRNGKey(0))
    builder = ScoreMatrixBuilder(ce, mesh8, ment_block=2, ent_block=4, pair_pad_multiple=16)
    # single-process: local mesh accepted, build succeeds end-to-end
    out = builder.build_multihost(params, ment, ent, chunk_dir=str(tmp_path / "c"))
    assert out is not None and out.shape == (4, 8)
    ref = builder(params, ment, ent)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_replicate_from_host_typed_prng_key(mesh8):
    """replicate_from_host must carry typed PRNG keys (the default rbg
    train rng) via key_data/wrap_key_data — np.asarray on a typed key
    raises, which used to kill multi-process training at init_state."""
    from anncur_tpu.parallel.multihost import replicate_from_host

    key = jax.random.key(7, impl="rbg")
    tree = {"rng": key, "w": np.ones((3,), np.float32)}
    out = replicate_from_host(mesh8, tree)
    assert jax.dtypes.issubdtype(out["rng"].dtype, jax.dtypes.prng_key)
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(out["rng"])),
        np.asarray(jax.random.key_data(key)),
    )
    # the replicated key must behave identically to the original
    np.testing.assert_array_equal(
        np.asarray(jax.random.uniform(out["rng"], (4,))),
        np.asarray(jax.random.uniform(key, (4,))),
    )
    np.testing.assert_array_equal(np.asarray(out["w"]), tree["w"])
