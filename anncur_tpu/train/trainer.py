"""Data-parallel training runtime.

Replaces the reference's PyTorch-Lightning trainer
(models/pairwise_trainer.py:168-266) with an SPMD jit train step over a
device mesh: the batch is sharded along the 'data' axis, params are
replicated, and XLA emits the gradient all-reduce over ICI — no DDP
process groups, no NCCL, no module (un)wrapping. Gradient accumulation
runs as a ``lax.scan`` over micro-batches inside the step (one compiled
program), matching the reference's grad_acc_steps semantics.

Supports bi-encoder (explicit / in-batch negatives, distillation) and
cross-encoder training, epoch-wise hard-negative re-mining with the
current towers, top-k + end-of-epoch checkpointing, and resume.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from functools import partial
from typing import Any, Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from anncur_tpu.config import Config
from anncur_tpu.models.biencoder import BiEncoder
from anncur_tpu.models.crossencoder import CrossEncoder
from anncur_tpu.train import data as data_mod
from anncur_tpu.train.checkpoint import TopKCheckpointManager, load_pytree
from anncur_tpu.train.losses import (
    bienc_loss_in_batch_negs,
    bienc_loss_w_negs,
    crossenc_loss,
    distill_loss,
    mrr_from_scores,
)
from anncur_tpu.train.optimizer import make_optimizer

LOGGER = logging.getLogger(__name__)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("params", "opt_state", "step", "rng"),
    meta_fields=(),
)
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array
    rng: jax.Array


class Trainer:
    """model_type 'bi_enc' | 'cross_enc' with the reference's loss zoo."""

    def __init__(
        self,
        config: Config,
        model,  # BiEncoder | CrossEncoder
        mesh: Optional[Mesh] = None,
        total_steps: int = 10000,
        tp_axis: Optional[str] = None,
        tracker=None,
    ):
        """``tp_axis``: name of a mesh axis to tensor-parallel the BERT
        towers over (Megatron-style column/row sharding via GSPMD, see
        parallel/tp.py). None = pure data parallelism (params replicated)."""
        self.config = config
        self.model = model
        self.mesh = mesh
        self.total_steps = total_steps
        self.tp_axis = tp_axis
        self.tracker = tracker
        self.is_bienc = isinstance(model, BiEncoder)
        self._tx: Optional[optax.GradientTransformation] = None
        self._train_step = None
        # jitted eval fns keyed by first_segment_end (None for bi-enc):
        # _loss_fn closes over self._fse at trace time, so each distinct
        # fse needs its own jit entry — and reusing them across
        # evaluate() calls avoids a recompile per dev eval.
        self._eval_fns: Dict[Optional[int], Callable] = {}
        self._dev_negs_epoch: Optional[int] = None
        self._dev_negs: Optional[np.ndarray] = None
        self._warned_replicated: set = set()
        self._ckpt = TopKCheckpointManager(
            os.path.join(config.result_dir, "model"),
            k=config.num_top_k_ckpts,
            metric=config.ckpt_metric,
            mode="min" if config.ckpt_metric == "loss" else "max",
        )

    # ---------------- state ------------------------------------------- #

    def init_state(self, key: Optional[jax.Array] = None) -> TrainState:
        key = key if key is not None else self.config.prng_key()
        k_init, k_train = jax.random.split(key)
        params = self.model.init(k_init)
        self._tx = make_optimizer(
            params,
            learning_rate=self.config.learning_rate,
            weight_decay=self.config.weight_decay,
            total_steps=self.total_steps,
            warmup_proportion=self.config.warmup_proportion,
            max_grad_norm=self.config.max_grad_norm,
            type_optimization=self.config.type_optimization or "all",
        )
        if self.mesh is not None and self.tp_axis is not None:
            from anncur_tpu.parallel.tp import shard_params

            # shard BEFORE tx.init so optimizer moments inherit shardings
            params = shard_params(params, self.mesh, self.tp_axis)
            state = TrainState(
                params=params,
                opt_state=self._tx.init(params),
                step=jnp.zeros((), jnp.int32),
                rng=k_train,
            )
            return state
        state = TrainState(
            params=params,
            opt_state=self._tx.init(params),
            step=jnp.zeros((), jnp.int32),
            rng=k_train,
        )
        if self.mesh is not None:
            if jax.process_count() > 1:
                # device_put cannot target non-addressable devices; build
                # the replicated global arrays from (identical) host values
                from anncur_tpu.parallel.multihost import replicate_from_host

                state = replicate_from_host(self.mesh, state)
            else:
                state = jax.device_put(state, NamedSharding(self.mesh, P()))
        return state

    # ---------------- losses ------------------------------------------ #

    def _loss_fn(
        self, params, batch, rng, train: bool = True
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """``train=False`` runs the forward in eval mode (dropout OFF, no
        rng) — dev metrics that drive checkpoint selection must be
        deterministic and unbiased, matching the reference's PL eval-mode
        validation (models/biencoder.py:685-719). In train mode each
        encode site gets its OWN rng so input/pos/neg dropout masks are
        decorrelated."""
        cfg = self.config
        if train:
            # 3 independent streams: input / pos-or-pospairs / negs
            r_in, r_pos, r_neg = jax.random.split(rng, 3)
        else:
            r_in = r_pos = r_neg = None
        if self.is_bienc:
            enc = self.model
            if "target_scores" in batch:  # distillation
                inp = enc.encode_input(params, batch["input"], train=train, rng=r_in)
                b, n, l = batch["labels"].shape
                lab = enc.encode_label(
                    params, batch["labels"].reshape(b * n, l), train=train, rng=r_pos
                ).reshape(b, n, -1)
                pred = jnp.sum(lab * inp[:, None, :], axis=2)
                loss = distill_loss(pred, batch["target_scores"])
                return loss, {"loss": loss}
            inp = enc.encode_input(params, batch["input"], train=train, rng=r_in)
            pos = enc.encode_label(params, batch["pos"], train=train, rng=r_pos)
            if "negs" in batch:
                b, n, l = batch["negs"].shape
                neg = enc.encode_label(
                    params, batch["negs"].reshape(b * n, l), train=train, rng=r_neg
                ).reshape(b, n, -1)
                loss = bienc_loss_w_negs(inp, pos, neg, cfg.loss_type, cfg.hinge_margin)
                pos_scores = jnp.sum(inp * pos, axis=1)
                neg_scores = jnp.sum(neg * inp[:, None, :], axis=2)
                return loss, {"loss": loss, "mrr": mrr_from_scores(pos_scores, neg_scores)}
            loss = bienc_loss_in_batch_negs(inp, pos, cfg.loss_type, cfg.hinge_margin)
            return loss, {"loss": loss}
        # cross-encoder
        enc = self.model
        fse = getattr(self, "_fse", None) or cfg.max_input_len
        pos_scores = enc.score(params, batch["pos_pairs"], fse, train=train, rng=r_pos)
        b, n, l = batch["neg_pairs"].shape
        neg_scores = enc.score(
            params, batch["neg_pairs"].reshape(b * n, l), fse, train=train, rng=r_neg
        ).reshape(b, n)
        loss = crossenc_loss(pos_scores, neg_scores, cfg.loss_type)
        return loss, {"loss": loss, "mrr": mrr_from_scores(pos_scores, neg_scores)}

    # ---------------- train step -------------------------------------- #

    def make_train_step(self):
        """jit step with internal micro-batch scan (grad accumulation)."""
        tx = self._tx
        assert tx is not None, "call init_state first"

        def step_fn(state: TrainState, batch):
            rng, new_rng = jax.random.split(state.rng)

            def micro(carry, xs):
                mb, idx = xs
                grads_acc, loss_acc = carry
                # fold the micro-batch index into the step rng: every
                # micro-batch gets an independent dropout mask (sharing
                # one rng across the accumulation scan made all micros
                # reuse identical masks)
                (loss, _aux), grads = jax.value_and_grad(self._loss_fn, has_aux=True)(
                    state.params, mb, jax.random.fold_in(rng, idx)
                )
                grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
                return (grads_acc, loss_acc + loss), loss

            zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            n_micro = jax.tree_util.tree_leaves(batch)[0].shape[0]
            (grads, loss_sum), micro_losses = jax.lax.scan(
                micro, (zeros, 0.0), (batch, jnp.arange(n_micro))
            )
            grads = jax.tree_util.tree_map(lambda g: g / n_micro, grads)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = TrainState(
                params=new_params,
                opt_state=new_opt,
                step=state.step + 1,
                rng=new_rng,
            )
            return new_state, {"loss": loss_sum / n_micro, "micro_losses": micro_losses}

        return jax.jit(step_fn, donate_argnums=(0,))

    def _shard_batch(self, batch):
        """Stack into (grad_acc, micro_b, ...) and shard micro batch dim.

        Multi-host: when the mesh spans processes (jax.process_count()>1
        after jax.distributed.initialize), ``batch`` is this process's
        LOCAL portion — an equal split of the global batch — and the
        global arrays are assembled from the per-process shards
        (parallel/multihost.py). The jit train step is identical either
        way; XLA routes the gradient all-reduce over ICI + DCN."""
        acc = max(1, self.config.grad_acc_steps)
        out = {}
        for k, v in batch.items():
            if np.ndim(v) == 0:
                continue
            v = np.asarray(v)
            b = v.shape[0]
            micro = b // acc
            if micro == 0:
                acc_eff, micro = 1, b
            else:
                acc_eff = acc
            if acc_eff * micro != b and k not in self._warned_replicated:
                # same loudness as the non-divisible-mesh warning below:
                # a batch size not divisible by grad_acc_steps silently
                # dropped the tail samples from EVERY step
                self._warned_replicated.add(k)
                LOGGER.warning(
                    "batch %r size %d not divisible by grad_acc_steps=%d: "
                    "dropping %d samples per step — pick a divisible "
                    "train_batch_size", k, b, acc_eff, b - acc_eff * micro,
                )
            out[k] = v[: acc_eff * micro].reshape((acc_eff, micro) + v.shape[1:])
        multi = self.mesh is not None and jax.process_count() > 1
        if self.mesh is not None:
            n_dev = self.mesh.shape.get("data", 1)
            micro_local = jax.tree_util.tree_leaves(out)[0].shape[1] if out else 0
            micro_b = micro_local * (jax.process_count() if multi else 1)
            if micro_b % max(n_dev, 1) == 0:
                spec = P(None, "data")
            else:
                if multi:
                    raise ValueError(
                        f"multi-host training requires the global micro-batch "
                        f"({micro_b}) to be divisible by the mesh data axis "
                        f"({n_dev}) — pad train_batch_size/grad_acc_steps"
                    )
                spec = P()
                if micro_b not in self._warned_replicated:
                    self._warned_replicated.add(micro_b)
                    LOGGER.warning(
                        "micro-batch %d is not divisible by data-parallel size %d; "
                        "replicating the batch on every device (a %dx throughput "
                        "cliff). Pad train_batch_size/grad_acc_steps so the "
                        "micro-batch is a multiple of the mesh 'data' axis.",
                        micro_b,
                        n_dev,
                        n_dev,
                    )
            if multi:
                from anncur_tpu.parallel.multihost import global_batch_from_local

                out = global_batch_from_local(self.mesh, out, spec)
            else:
                out = jax.device_put(
                    {k: jnp.asarray(v) for k, v in out.items()},
                    NamedSharding(self.mesh, spec),
                )
        else:
            out = {k: jnp.asarray(v) for k, v in out.items()}
        if "first_segment_end" in batch:
            # static python int: pair layout is constant per dataset
            self._fse = int(batch["first_segment_end"])
        return out

    # ---------------- eval -------------------------------------------- #

    def _get_eval_fn(self, fse: Optional[int]):
        if fse not in self._eval_fns:
            # eval mode: dropout OFF, no rng — dev_loss/dev_mrr must be
            # the deterministic no-dropout forward (reference validates
            # in PL eval mode, models/biencoder.py:685-704; round-2 ran
            # dev eval with dropout ON, biasing checkpoint selection)
            self._eval_fns[fse] = jax.jit(
                lambda p, b: self._loss_fn(p, b, None, train=False)
            )
        return self._eval_fns[fse]

    def evaluate(self, state: TrainState, batches: Iterator[Dict]) -> Dict[str, float]:
        # per-batch losses are means over that batch: weight by batch
        # size so a short tail batch (eval batching pads nothing) does
        # not over-count its examples in the dataset-level mean
        losses, mrrs, weights = [], [], []
        for batch in batches:
            if "first_segment_end" in batch:
                self._fse = int(batch["first_segment_end"])
            eval_fn = self._get_eval_fn(getattr(self, "_fse", None) if not self.is_bienc else None)
            b = {
                k: jnp.asarray(v)
                for k, v in batch.items()
                if k != "first_segment_end"
            }
            loss, aux = eval_fn(state.params, b)
            losses.append(float(loss))
            weights.append(next(v.shape[0] for v in b.values() if np.ndim(v) > 0))
            if "mrr" in aux:
                mrrs.append(float(aux["mrr"]))
        w = np.asarray(weights, np.float64)
        res = {
            "dev_loss": float(np.average(losses, weights=w)) if losses else float("nan")
        }
        if mrrs:
            res["dev_mrr"] = float(np.average(mrrs, weights=w[: len(mrrs)]))
        return res

    def _place_like(self, template: TrainState, restored: TrainState) -> TrainState:
        """Place a host-restored state the way the live ``template`` is
        placed (mesh-replicated, TP-sharded, or multi-host global)."""
        if self.mesh is None:
            return restored
        if jax.process_count() > 1:
            from anncur_tpu.parallel.multihost import replicate_from_host

            return replicate_from_host(self.mesh, restored)

        def put(tmpl, leaf):
            if isinstance(tmpl, jax.Array):
                return jax.device_put(leaf, tmpl.sharding)
            return leaf

        return jax.tree.map(put, template, restored)

    # ---------------- full loop --------------------------------------- #

    def train(
        self,
        train_data: data_mod.EntLinkDataset,
        dev_data: Optional[data_mod.EntLinkDataset] = None,
        resume: bool = False,
    ) -> TrainState:
        cfg = self.config
        state = self.init_state()
        start_epoch = 0
        if resume:
            last = self._ckpt.latest_eoe()
            if last is not None:
                tree, _ = load_pytree(last["path"])
                restored = dataclasses.replace(
                    state,
                    params=tree["params"],
                    opt_state=tree["opt_state"],
                    step=jnp.asarray(tree["step"], jnp.int32),
                    # older checkpoints predate the rng leaf; fall back
                    # to the fresh seed-derived stream for those
                    rng=tree.get("rng", state.rng),
                )
                # re-establish the live placement: init_state replicated/
                # sharded the state over the mesh, and the restored host
                # leaves must match it (multi-host resume crashed on the
                # first step mixing a global-mesh batch with host-local
                # params; single-host silently lost the NamedSharding)
                state = self._place_like(state, restored)
                start_epoch = last["epoch"] + 1
                LOGGER.info("resumed from %s (epoch %d)", last["path"], start_epoch)

        train_step = self.make_train_step()
        batch_size = cfg.train_batch_size
        fast_dev = cfg.fast_dev_run

        eval_every = int(cfg.eval_interval) if cfg.eval_interval and cfg.eval_interval > 0 else 0
        steps_since_eval = 0
        for epoch in range(start_epoch, cfg.num_epochs):
            self._last_state = state  # current towers for triplet-distill mining
            neg_labels = self._epoch_negatives(train_data, state, epoch)
            batches = self._make_batches(train_data, neg_labels, batch_size, epoch)
            t0 = time.time()
            for bi, batch in enumerate(batches):
                if fast_dev and bi >= fast_dev:
                    break
                sharded = self._shard_batch(batch)
                state, metrics = train_step(state, sharded)
                steps_since_eval += 1
                if eval_every and dev_data is not None and steps_since_eval >= eval_every:
                    # mid-epoch dev eval + top-k checkpointing (reference:
                    # eval_interval / PL val_check_interval)
                    steps_since_eval = 0
                    self._dev_eval_and_ckpt(state, dev_data, batch_size, epoch)
                if bi % cfg.print_interval == 0:
                    loss_val = float(metrics["loss"])
                    LOGGER.info(
                        "epoch %d step %d loss %.4f (%.2f s/step)",
                        epoch,
                        int(state.step),
                        loss_val,
                        (time.time() - t0) / (bi + 1),
                    )
                    if self.tracker is not None:
                        self.tracker.log(
                            {"train_loss": loss_val, "epoch": epoch}, step=int(state.step)
                        )
            # ---- dev eval + checkpoints (reference: top-k on dev metric
            # + end-of-epoch, pairwise_trainer.py:214-237)
            if dev_data is not None:
                self._dev_eval_and_ckpt(state, dev_data, batch_size, epoch)
            # multi-host: every process runs train() SPMD with a shared
            # result_dir; concurrent writers would interleave the same
            # eoe/manifest files. State is replicated, so the process-0
            # checkpoint speaks for all.
            if jax.process_index() == 0:
                self._ckpt.save_end_of_epoch(
                    {
                        "params": state.params,
                        "opt_state": state.opt_state,
                        "step": int(state.step),
                        # rng continuity: resume must pick up the dropout
                        # stream mid-sequence, not rewind to the seed
                        # (typed rbg keys pickle via checkpoint._KeyLeaf)
                        "rng": state.rng,
                    },
                    epoch,
                    int(state.step),
                )
        return state

    def _dev_eval_and_ckpt(self, state: TrainState, dev_data, batch_size: int, epoch: int) -> None:
        cfg = self.config
        # Mine dev negatives once per epoch, not once per eval: with
        # bienc_hard_negs at a step-level eval_interval this would
        # otherwise re-embed the whole corpus on every dev eval.
        if self._dev_negs_epoch != epoch:
            self._dev_negs = self._epoch_negatives(dev_data, state, epoch)
            self._dev_negs_epoch = epoch
        dev_negs = self._dev_negs
        dev_metrics = self.evaluate(
            state,
            self._make_batches(dev_data, dev_negs, batch_size, epoch, shuffle=False,
                               for_eval=True),
        )
        LOGGER.info("epoch %d dev: %s", epoch, dev_metrics)
        if self.tracker is not None:
            self.tracker.log(dict(dev_metrics, epoch=epoch), step=int(state.step))
        metric_name = "dev_mrr" if cfg.ckpt_metric == "mrr" else "dev_loss"
        if metric_name not in dev_metrics:
            # e.g. ckpt_metric='mrr' with in_batch/distill strategies,
            # whose eval produces no ranked candidates: without this the
            # top-k manifest stayed silently empty for the whole run
            if not getattr(self, "_warned_missing_metric", False):
                LOGGER.warning(
                    "ckpt_metric=%s but eval produced no %s (neg_strategy=%s "
                    "yields no ranked candidates); selecting top-k "
                    "checkpoints by dev_loss instead",
                    cfg.ckpt_metric, metric_name, cfg.neg_strategy,
                )
                self._warned_missing_metric = True
                self._ckpt.metric, self._ckpt.mode = "loss", "min"
            metric_name = "dev_loss"
        metric_val = dev_metrics.get(metric_name, float("nan"))
        if jax.process_index() != 0:
            return  # single-writer checkpointing (see train())
        if np.isfinite(metric_val):
            self._ckpt.maybe_save(
                {
                    "params": state.params,
                    "opt_state": state.opt_state,
                    "step": int(state.step),
                    "rng": state.rng,
                },
                metric_val,
                int(state.step),
                epoch,
            )

    DISTILL_TRP_STRATEGIES = ("top_ce_w_bienc_hard_negs_trp", "top_ce_w_rand_negs_trp")

    def _epoch_negatives(self, data, state: TrainState, epoch: int) -> Optional[np.ndarray]:
        cfg = self.config
        if self.is_bienc and cfg.neg_strategy in (
            ("in_batch", "top_ce_match") + self.DISTILL_TRP_STRATEGIES
        ):
            return None
        if cfg.neg_strategy == "bienc_hard_negs" and self.is_bienc:
            # re-mine with the CURRENT towers each epoch (reference:
            # EntLinkData.get_bienc_model, pairwise_trainer.py:133-164)
            from anncur_tpu.evalx.retrieve_rerank import embed_tokenized

            inp = embed_tokenized(self.model, state.params, data.mention_tokens, cfg.eval_batch_size, "input")
            lab = embed_tokenized(self.model, state.params, data.entity_tokens, cfg.eval_batch_size, "label")
            return data_mod.mine_negatives(
                data, "bienc_hard_negs", cfg.num_negs, seed=epoch, input_embeds=inp, label_embeds=lab
            )
        return data_mod.mine_negatives(data, cfg.neg_strategy, cfg.num_negs, seed=epoch)

    def _make_batches(self, data, neg_labels, batch_size, epoch, shuffle=None,
                      for_eval=False):
        shuffle = self.config.shuffle_data if shuffle is None else shuffle
        # eval must see every example exactly once: no tail drop, no
        # wrap-padding (which duplicated examples into the dev metrics
        # that drive top-k checkpoint selection); costs one extra jit
        # shape for the short tail batch. Training keeps each
        # generator's default tail behavior (fixed shapes).
        tail = {"drop_remainder": False, "pad_remainder": False} if for_eval else {}
        if self.is_bienc:
            if self.config.neg_strategy == "top_ce_match":
                # distillation from teacher CE scores (reference
                # 'top_ce_match' datasets, data_process.py:706-868)
                return data_mod.distill_batches(
                    data, self.config.distill_n_labels, batch_size, shuffle, epoch,
                    **tail,
                )
            if self.config.neg_strategy in self.DISTILL_TRP_STRATEGIES:
                # triplet-style distillation (reference
                # 'top_ce_w_{bienc_hard,rand}_negs_trp', :810-860):
                # hard variant mines negs with the CURRENT towers
                inp = lab = None
                state = getattr(self, "_last_state", None)
                if self.config.neg_strategy == "top_ce_w_bienc_hard_negs_trp" and state is not None:
                    # cache per (dataset, epoch): with a step-level
                    # eval_interval the dev loader would otherwise
                    # re-embed the whole dev corpus on EVERY dev eval
                    # (the same cliff the per-epoch dev-negs cache fixes)
                    cache = getattr(self, "_trp_embed_cache", None)
                    key = (id(data), epoch)
                    if cache is not None and cache[0] == key:
                        inp, lab = cache[1], cache[2]
                    else:
                        from anncur_tpu.evalx.retrieve_rerank import embed_tokenized

                        inp = embed_tokenized(self.model, state.params, data.mention_tokens, self.config.eval_batch_size, "input")
                        lab = embed_tokenized(self.model, state.params, data.entity_tokens, self.config.eval_batch_size, "label")
                        self._trp_embed_cache = (key, inp, lab)
                return data_mod.distill_triplet_batches(
                    data, self.config.distill_n_labels, batch_size, shuffle, epoch,
                    input_embeds=inp, label_embeds=lab, **tail,
                )
            if neg_labels is None:
                return (
                    {"input": b["input"], "pos": b["pos"]}
                    for b in data_mod.bienc_batches(
                        data, np.zeros((data.n_ments, 1), np.int64), batch_size,
                        shuffle, epoch, **tail,
                    )
                )
            return data_mod.bienc_batches(data, neg_labels, batch_size, shuffle, epoch, **tail)
        return data_mod.crossenc_batches(data, neg_labels, batch_size, shuffle, epoch, **tail)
