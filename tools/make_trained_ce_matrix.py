"""Generate a TRAINED-cross-encoder score matrix for matched-recall
calibration (VERDICT r3 item 1a).

Round-3's matched-recall evidence (benchmarks/adaptive_matched_recall.
json) was calibrated on synthetic low-rank+noise matrices only; the
scale drive hinted that a trained CE's matrix needs a ~2x higher
adaptive budget. This tool produces the missing evidence family: a
score matrix from a CE that actually LEARNED an entity-linking task —
trained with the same recipe the e2e drive uses (tiny spec, ce loss,
random negatives, rbg rng; tools/drive_e2e.py:85-111) on a synthetic
world at yugioh scale (10k entities), then scored over (train + eval)
mentions x ALL entities with the production ScoreMatrixBuilder.

The eval mentions are EXCLUDED from CE training (the matrix's query
rows are unseen queries, like ZeShEL test mentions). Entities get
3-word titles so 10k of them stay mostly distinct under the 32-word
test vocabulary (2-word titles would collide ~10x and duplicate score
columns).

Runs fully on CPU (tiny CE; the TPU chip is serialized for the real
benches). Writes benchmarks/trained_ce_matrix.npz with float16 scores
(spectrum metadata + training loss recorded alongside), which
tools/adaptive_matched_recall.py picks up as the `trained_ce` scenario.

Reference cost axis being calibrated:
/root/reference/eval/run_retrieval_eval_wrt_exact_crossenc.py:480-481.

Usage: python tools/make_trained_ce_matrix.py [--quick] [--out PATH]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("ANNCUR_ALLOW_CPU", "1")

# backend decided before the first jax op: --tpu trains on the real chip
# (a 1000-step run is minutes there vs hours on this 1-core host); the
# default stays CPU so the artifact is reproducible anywhere
if "--tpu" not in sys.argv:
    from anncur_tpu.utils.platform import force_cpu_devices

    force_cpu_devices(8)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from anncur_tpu.config import Config  # noqa: E402
from anncur_tpu.data.synthetic import _WORDS  # noqa: E402
from anncur_tpu.data.tokenization import tokenize_entities, tokenize_mentions  # noqa: E402
from anncur_tpu.models.tokenizer import WordPieceTokenizer, make_test_vocab  # noqa: E402
from anncur_tpu.indexer import ScoreMatrixBuilder  # noqa: E402
from anncur_tpu.models.bert import BertSpec  # noqa: E402
from anncur_tpu.models.crossencoder import CrossEncoder  # noqa: E402
from anncur_tpu.parallel import make_mesh  # noqa: E402
from anncur_tpu.train.data import EntLinkDataset, crossenc_batches, mine_negatives  # noqa: E402
from anncur_tpu.train.trainer import Trainer  # noqa: E402


def make_big_world(rng, n_ents, n_ments, max_len=32, n_rare=4096):
    """Synthetic world like data/synthetic.py::make_world, scaled to 10k
    entities by a RARE-WORD vocabulary: each entity title is two words
    drawn from ``n_rare`` synthetic rare words (whole-word vocab
    entries) plus common-word context. The gold title appears verbatim
    in the mention, so ranking = learned token matching over rare words
    — a task a tiny CE demonstrably LEARNS and generalizes to unseen
    mentions (3-word titles over the 32 common words do NOT train:
    measured loss stuck at ln(5)=1.61 for 600 steps at lr 1e-3..1e-2 —
    the tiny model cannot learn order-sensitive trigram matching, and a
    constant-score matrix would make this calibration vacuous,
    CLAUDE.md)."""
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    rare = []
    seen = set()
    while len(rare) < n_rare:
        w = "".join(rng.choice(letters, size=7))
        if w not in seen:
            seen.add(w)
            rare.append(w)
    titles = set()
    entities = []
    while len(entities) < n_ents:
        t = tuple(rng.choice(n_rare, size=2, replace=False))
        if t in titles:
            continue
        titles.add(t)
        title = f"{rare[t[0]]} {rare[t[1]]}"
        desc = " ".join(rng.choice(_WORDS, size=12))
        entities.append((title, desc))
    mentions = []
    for i in range(n_ments):
        label = int(rng.integers(0, n_ents))
        mentions.append(
            {
                "mention": entities[label][0],
                "mention_id": f"m{i}",
                "context_left": " ".join(rng.choice(_WORDS, size=int(rng.integers(0, 20)))),
                "context_right": " ".join(rng.choice(_WORDS, size=int(rng.integers(0, 20)))),
                "context_doc_id": f"d{i}",
                "type": "synth",
                "label_id": label,
                "world": "calibville",
            }
        )
    tokenizer = WordPieceTokenizer(make_test_vocab(list(_WORDS) + rare))
    ment_toks = tokenize_mentions(mentions, tokenizer, max_len)
    ent_toks = tokenize_entities(entities, tokenizer, max_len)
    gt = np.asarray([m["label_id"] for m in mentions], np.int32)
    return ment_toks, ent_toks, gt, tokenizer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="tiny shapes (CI smoke)")
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "benchmarks",
            "trained_ce_matrix.npz",
        ),
    )
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--tpu", action="store_true",
                    help="train/score on the real chip (minutes vs hours)")
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    if args.quick and "trained_ce_matrix.npz" in os.path.basename(args.out):
        args.out = args.out.replace(".npz", "_quick.npz")

    if args.quick:
        n_ents, n_train, n_q, n_extra_train_ments = 400, 60, 16, 200
        steps = 30
    else:
        # yugioh-ish scale: matches the adaptive_matched_recall shapes.
        # 8000 training mentions + 2000 steps of batch 64: the tiny-CE
        # probes showed generalization needs capacity AND data — batch-16
        # runs of 300-600 steps sat at ln(5) forever (CLAUDE.md pattern)
        n_ents, n_train, n_q, n_extra_train_ments = 10000, 500, 128, 8000
        steps = args.steps

    n_ments = n_train + n_q + n_extra_train_ments
    rng = np.random.default_rng(0)
    ment, ent, gt, tokenizer = make_big_world(rng, n_ents, n_ments)
    n_dev = len(jax.devices())
    mesh = make_mesh((n_dev,), ("data",))
    # 4-layer/128-hidden: the tiny (2-layer/64) spec memorizes single
    # batches in 25 steps but never forms a general matching circuit
    # (fresh-batch loss pinned at ln(5) for 600+ steps at lr 1e-3..1e-2,
    # measured round 4); this spec is still ~50x cheaper than bert-base
    spec = (
        BertSpec.tiny(vocab_size=tokenizer.vocab_size)
        if args.quick
        else BertSpec.tiny(
            vocab_size=tokenizer.vocab_size, hidden_size=128, num_layers=4,
            num_heads=8, intermediate_size=512,
        )
    )
    ce = CrossEncoder(spec=spec, cross_enc_type="default", compute_dtype=jnp.float32)

    # CE training sees ONLY mentions past the matrix rows: rows 0..n_train
    # are the train-score queries, n_train..n_train+n_q the eval queries,
    # the rest feed gradient steps (drive recipe: drive_e2e.py:93-111)
    train_slice = slice(n_train + n_q, n_ments)
    data = EntLinkDataset(ment[train_slice], ent, gt[train_slice])
    cfg = Config(
        model_type="cross_enc", loss_type="ce", num_negs=4,
        train_batch_size=16 if args.quick else args.batch,
        # 3e-4 for the 4-layer/128 spec: at 1e-3 (fine for the 2-layer
        # drive model) this spec sits at ln(5) forever — measured round 4
        # (TPU lr sweep: 3e-4 -> loss 0.02 @ 1200 steps; 1e-3, 3e-3 ->
        # 1.61 flat; single-batch memorization also fails at 1e-3)
        grad_acc_steps=1, learning_rate=1e-3 if args.quick else 3e-4,
        num_epochs=1000, base_res_dir="/tmp/trained_ce_matrix_train",
    )
    tr = Trainer(cfg, ce, mesh=mesh, total_steps=steps)
    st = tr.init_state()
    step = tr.make_train_step()
    negs = mine_negatives(data, "random", cfg.num_negs, seed=0)
    t0 = time.time()
    done = False
    loss = float("nan")
    for _ in range(1000):
        for batch in crossenc_batches(data, negs, cfg.train_batch_size, shuffle=False):
            st, m = step(st, tr._shard_batch(batch))
            s = int(st.step)
            if s % 200 == 0:
                print(f"  step {s} loss {float(m['loss']):.4f} "
                      f"({time.time() - t0:.0f}s)", flush=True)
            if s >= steps:
                done = True
                break
        if done:
            break
        loss = float(m["loss"])
    loss = float(m["loss"])
    train_s = time.time() - t0
    print(f"CE trained {int(st.step)} steps, final loss {loss:.4f} ({train_s:.0f}s)", flush=True)
    assert np.isfinite(loss)

    builder = ScoreMatrixBuilder(
        ce, mesh, ment_block=8 if args.quick else 16,
        ent_block=8 if args.quick else 256,
        pair_pad_multiple=32,
    )
    t0 = time.time()
    mat = np.asarray(builder(st.params, ment[: n_train + n_q], ent), np.float32)
    score_s = time.time() - t0
    pairs = (n_train + n_q) * n_ents
    print(f"scored {pairs} pairs in {score_s:.0f}s ({pairs / score_s:.0f} pairs/s)", flush=True)

    sv = np.linalg.svd(mat[:n_train] - mat[:n_train].mean(axis=0), compute_uv=False)
    energy = np.cumsum(sv**2) / np.sum(sv**2)
    rank97 = int(np.searchsorted(energy, 0.97) + 1)
    # sanity: the trained CE must rank gold entities highly for the eval
    # queries, else the matrix carries no ranking signal (CLAUDE.md: a
    # constant-score matrix makes recall checks vacuous)
    eval_rows = mat[n_train : n_train + n_q]
    gold = gt[n_train : n_train + n_q]
    rank_of_gold = (eval_rows > eval_rows[np.arange(n_q), gold][:, None]).sum(axis=1)
    r_at_64 = float((rank_of_gold < 64).mean())
    print(f"spectrum: s2/s1={sv[1]/sv[0]:.4f}, 97%-energy rank={rank97}; "
          f"gold-in-top-64 (trained CE, unseen queries): {r_at_64:.3f}", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez_compressed(
        args.out,
        scores=mat.astype(np.float16),
        n_train=n_train,
        n_q=n_q,
        gt_eval=gold,
        meta=json.dumps(
            {
                "quick": bool(args.quick),
                "n_ents": n_ents,
                "train_steps": int(st.step),
                "final_loss": round(loss, 4),
                "s2_over_s1": round(float(sv[1] / sv[0]), 4),
                "rank_97pct_energy": rank97,
                "gold_in_top64_frac": round(r_at_64, 4),
                "train_wall_s": round(train_s, 1),
                "score_wall_s": round(score_s, 1),
                "recipe": "tools/make_trained_ce_matrix.py (drive recipe, eval rows unseen)",
            }
        ),
    )
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
