"""Tensor-parallel training on a (data=4, model=2) mesh: params really
shard, the step runs, loss is finite and matches the replicated run."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from anncur_tpu.config import Config
from anncur_tpu.data.synthetic import make_tokenized_world
from anncur_tpu.models.bert import BertSpec
from anncur_tpu.models.biencoder import BiEncoder
from anncur_tpu.parallel import make_mesh
from anncur_tpu.parallel.tp import param_pspecs, shard_params
from anncur_tpu.train.data import EntLinkDataset, bienc_batches, mine_negatives
from anncur_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def mesh42():
    return make_mesh((4, 2), ("data", "model"))


def test_param_pspecs_rules():
    spec = BertSpec.tiny()
    enc = BiEncoder(spec=spec, pooling_type="cls", embed_dim=spec.hidden_size, compute_dtype=jnp.float32)
    params = enc.init(jax.random.PRNGKey(0))
    specs = param_pspecs(params)
    layer = specs["input_bert"]["layers"][0]
    assert layer["attn"]["q_kernel"] == P(None, "model")
    assert layer["attn"]["out_kernel"] == P("model", None)
    assert layer["mlp"]["in_kernel"] == P(None, "model")
    assert layer["mlp"]["in_bias"] == P("model")
    assert layer["mlp"]["out_kernel"] == P("model", None)
    assert layer["mlp"]["ln_scale"] == P()
    assert specs["input_bert"]["embeddings"]["word"] == P()


def test_params_actually_sharded(mesh42):
    spec = BertSpec.tiny(hidden_size=64, num_heads=4)
    enc = BiEncoder(spec=spec, pooling_type="cls", embed_dim=64, compute_dtype=jnp.float32)
    params = shard_params(enc.init(jax.random.PRNGKey(0)), mesh42)
    kern = params["input_bert"]["layers"][0]["mlp"]["in_kernel"]
    # sharded over 'model' (2 ways) on dim 1
    assert len(kern.sharding.device_set) == 8
    shard_shape = kern.sharding.shard_shape(kern.shape)
    assert shard_shape[1] == kern.shape[1] // 2


def test_tp_train_step_matches_replicated(mesh42):
    data_ment, data_ent, gt, tok = make_tokenized_world(
        seed=4, n_ents=16, n_ments=16, max_ment_len=16, max_ent_len=16
    )
    data = EntLinkDataset(data_ment, data_ent, gt)
    spec = BertSpec.tiny(vocab_size=tok.vocab_size, hidden_size=64, num_heads=4, num_layers=1, intermediate_size=128)
    enc = BiEncoder(spec=spec, pooling_type="cls", embed_dim=64, compute_dtype=jnp.float32)
    cfg = Config(model_type="bi_enc", loss_type="ce", num_negs=2,
                 train_batch_size=8, grad_acc_steps=1, base_res_dir="/tmp/tp_test")

    negs = mine_negatives(data, "random", 2, seed=0)
    batch = next(bienc_batches(data, negs, 8, shuffle=False))

    losses = {}
    for name, tp_axis in (("replicated", None), ("tp", "model")):
        trainer = Trainer(cfg, enc, mesh=mesh42, total_steps=10, tp_axis=tp_axis)
        state = trainer.init_state()
        step = trainer.make_train_step()
        state, m = step(state, trainer._shard_batch(batch))
        losses[name] = float(m["loss"])
        assert np.isfinite(losses[name])
    # same init seed + same batch -> identical loss regardless of sharding
    assert abs(losses["tp"] - losses["replicated"]) < 1e-4


def test_builder_on_2d_mesh(mesh42):
    """Entity-sharded score-matrix build must work when the mesh has
    extra axes (entities split on 'data', replicated over 'model')."""
    import numpy as np

    from anncur_tpu.data.synthetic import make_tokenized_world
    from anncur_tpu.indexer.score_matrix import ScoreMatrixBuilder
    from anncur_tpu.models.crossencoder import CrossEncoder

    ment, ent, gt, tok = make_tokenized_world(seed=13, n_ents=32, n_ments=6,
                                              max_ment_len=16, max_ent_len=16)
    spec = BertSpec.tiny(vocab_size=tok.vocab_size, max_position_embeddings=64)
    ce = CrossEncoder(spec=spec, compute_dtype=jnp.float32)
    params = ce.init(jax.random.PRNGKey(0))
    b2d = ScoreMatrixBuilder(ce, mesh42, ment_block=3, ent_block=4, pair_pad_multiple=32)
    got = b2d(params, ment, ent)
    from anncur_tpu.parallel import make_mesh

    b1d = ScoreMatrixBuilder(ce, make_mesh((8,), ("data",)), ment_block=3, ent_block=4, pair_pad_multiple=32)
    want = b1d(params, ment, ent)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_merge_worlds_units():
    import numpy as np

    from anncur_tpu.train.data import EntLinkDataset, merge_worlds, mine_negatives

    d1 = EntLinkDataset(np.ones((4, 8), np.int32), np.ones((10, 8), np.int32),
                        np.array([1, 2, 3, 4]))
    d2 = EntLinkDataset(np.ones((3, 6), np.int32) * 2, np.ones((5, 6), np.int32) * 2,
                        np.array([0, 1, 2]))
    m = merge_worlds([d1, d2])
    assert m.n_ments == 7 and m.n_ents == 15
    assert m.mention_tokens.shape == (7, 8) and m.entity_tokens.shape == (15, 8)
    np.testing.assert_array_equal(m.gt_labels[4:], [10, 11, 12])
    # negatives stay within each mention's world
    negs = mine_negatives(m, "random", num_negs=4, seed=0)
    assert np.all(negs[:4] < 10)
    assert np.all(negs[4:] >= 10) and np.all(negs[4:] < 15)
