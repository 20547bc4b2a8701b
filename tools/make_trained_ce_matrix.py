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


def make_shared_world(rng, n_ents, n_ments, max_len=32, n_rare=1200):
    """The HARD calibration world (VERDICT r4 item 2): entity titles are
    2 rare words drawn WITH REUSE from a pool of ``n_rare`` (average
    word degree ~2*n_ents/n_rare ~ 17 entities/word), so entities form
    overlapping families sharing surface forms. A CE that learns graded
    word matching (both-match > one-match > none) produces a score
    matrix ~ B A^T over the (entity x word) incidence — heavy-tailed by
    construction: the idealized overlap matrix at these shapes has
    97%-energy rank ~460 vs 15 for the round-4 disjoint-title world
    (where the only structure was one spike per gold). Mirrors the
    reference's own premise that real CE matrices have effective rank in
    the hundreds (eval/compute_m2e_matrix_ranks.py:29-56).

    Returns (ment_toks, ent_toks, gt, tokenizer, hard_negs) where
    ``hard_negs[i]`` lists entities sharing EXACTLY ONE title word with
    mention i's gold — the negatives that force the graded (not binary)
    matching circuit during training."""
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    rare = []
    seen_w = set()
    while len(rare) < n_rare:
        w = "".join(rng.choice(letters, size=7))
        if w not in seen_w:
            seen_w.add(w)
            rare.append(w)
    titles = set()
    pairs = []
    while len(pairs) < n_ents:
        t = tuple(sorted(rng.choice(n_rare, size=2, replace=False)))
        if t in titles:
            continue
        titles.add(t)
        pairs.append(t)
    word_to_ents = [[] for _ in range(n_rare)]
    for i, (a, b) in enumerate(pairs):
        word_to_ents[a].append(i)
        word_to_ents[b].append(i)
    entities = []
    for a, b in pairs:
        title = f"{rare[a]} {rare[b]}"
        desc = " ".join(rng.choice(_WORDS, size=12))
        entities.append((title, desc))
    mentions, hard_negs = [], []
    for i in range(n_ments):
        label = int(rng.integers(0, n_ents))
        a, b = pairs[label]
        sibs = [e for w in (a, b) for e in word_to_ents[w] if e != label]
        hard_negs.append(np.asarray(sibs, np.int32))
        mentions.append(
            {
                "mention": entities[label][0],
                "mention_id": f"m{i}",
                "context_left": " ".join(rng.choice(_WORDS, size=int(rng.integers(0, 20)))),
                "context_right": " ".join(rng.choice(_WORDS, size=int(rng.integers(0, 20)))),
                "context_doc_id": f"d{i}",
                "type": "synth",
                "label_id": label,
                "world": "hardville",
            }
        )
    tokenizer = WordPieceTokenizer(make_test_vocab(list(_WORDS) + rare))
    ment_toks = tokenize_mentions(mentions, tokenizer, max_len)
    ent_toks = tokenize_entities(entities, tokenizer, max_len)
    gt = np.asarray([m["label_id"] for m in mentions], np.int32)
    return ment_toks, ent_toks, gt, tokenizer, hard_negs


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
    ap.add_argument("--world", choices=["shared", "rare"], default="shared",
                    help="'shared' (default): overlapping-title hard world "
                    "(heavy-tailed matrix, ~rank-460 idealized); 'rare': the "
                    "round-4 disjoint-title world (97%%-energy rank 15)")
    args = ap.parse_args()

    if args.world == "shared" and args.out.endswith("trained_ce_matrix.npz"):
        # the hard world gets its own scenario file; the round-4 easy
        # matrix stays committed as a separate (easier) spectrum
        args.out = args.out.replace(".npz", "_hard.npz")
    if args.quick and "trained_ce_matrix" in os.path.basename(args.out):
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
    hard_negs = None
    if args.world == "shared":
        ment, ent, gt, tokenizer, hard_negs = make_shared_world(
            # keep the average word degree ~17 at quick shapes too
            rng, n_ents, n_ments, n_rare=120 if args.quick else 1200
        )
    else:
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
    if hard_negs is not None:
        # half the negatives become one-word-overlap siblings: without
        # them the CE can get the loss to ~0 with BINARY any-rare-word-
        # match scoring and the matrix loses its graded (heavy-tailed)
        # structure — the whole point of the shared world
        nrng = np.random.default_rng(1)
        n_hard = cfg.num_negs // 2
        for j, mi in enumerate(range(train_slice.start, train_slice.stop)):
            sibs = hard_negs[mi]
            sibs = sibs[sibs != gt[mi]]
            if sibs.size:
                take = nrng.choice(sibs, size=n_hard, replace=sibs.size < n_hard)
                negs[j, :n_hard] = take
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
                "world": args.world,
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
