"""Candidate scoring + decode — the two Arrow UDF families (SURVEY.md §2.9).

Fused path (default for deterministic scorers)
    One ``mapInPandas`` pass per turn row: enumerate span triples (C3),
    score (M1-M5 stand-in), 6-permutation ensemble + direction normalize +
    NMS (D2-D5), project fact texts (G1).  Logits never become Spark rows, so
    extraction is SHUFFLE-FREE end to end — scan → mapInPandas → facts.
    This is the 100 TB plan: throughput scales linearly with input splits and
    there is no wide dependency to skew.

Two-stage path (for expensive model scorers + skew salting)
    ``score_candidates`` emits one row per span triple with logit arrays —
    per-(sentence, subject) work units that can be salted/split across
    executors when a mention-dense sentence would hot-spot a task
    (SURVEY.md §4 item 1).  ``decode_scores`` then groups by sentence
    (``applyInPandas``) and runs the identical decode core.  Tests assert the
    two paths emit byte-identical facts.

Scorers are deterministic numpy (text2nkg_spark/scoring_core.py); a real
BERT scorer drops into ``score_candidates``'s batch loop (gated import —
torch/transformers are not shipped here).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from text2nkg_spark.candidates import enumerate_triples
from text2nkg_spark.config import PipelineConfig
from text2nkg_spark.decode_core import (
    decode_sentence, decode_sentences_batch)
from text2nkg_spark.labels import LabelSpace
from text2nkg_spark.scoring_core import (
    gold_logits, gold_orderings, hash_logits, hash_logits_batch, log_softmax)

FACT_SCHEMA = (
    "conv_id string, turn_idx int, pred_idx int, "
    "m1s int, m1e int, m2s int, m2e int, rel string, "
    "m3s int, m3e int, qual string, rel_score double, q_score double, "
    "subj string, obj string, value string"
)

SCORE_SCHEMA = (
    "conv_id string, turn_idx int, cand_idx long, i int, j int, k int, "
    "m1s int, m1e int, m2s int, m2e int, m3s int, m3e int, "
    "n_entities int, rel_logits array<double>, q_logits array<double>"
)


def stable_doc_id(conv_id: str) -> int:
    """Numeric doc key for hash scoring — shared with the test oracle."""
    if conv_id.startswith("conv") and conv_id[4:].isdigit():
        return int(conv_id[4:])
    import zlib

    return zlib.crc32(conv_id.encode("utf-8"))


# one scorer per python worker (executor-local model load — never
# broadcast weights through the driver); keyed by the config that shapes it
_WORKER_SCORERS: dict = {}


def _make_tokenizer(cfg: PipelineConfig):
    from text2nkg_spark.tokenization import (
        FakeWordpieceTokenizer, IdentityTokenizer)

    if cfg.tokenizer == "wordpiece":
        return FakeWordpieceTokenizer(cfg.wordpiece_piece_len)
    if cfg.tokenizer == "identity":
        return IdentityTokenizer()
    raise ValueError(f"unknown tokenizer '{cfg.tokenizer}'")


def _enumerate(cfg: PipelineConfig, ents: np.ndarray, tokens, tokenizer):
    """Candidate enumeration under the configured tokenizer: identity uses
    the vectorized full-grid path; wordpiece maps the pruning bounds
    through token2subword prefix sums (run_re.py:490-491, 516-517)."""
    if cfg.tokenizer == "identity":
        return enumerate_triples(ents, cfg.max_seq_length)
    from text2nkg_spark.candidates import (
        enumerate_triples_subword, token2subword_array)

    t2s = token2subword_array(list(tokens), tokenizer)
    return enumerate_triples_subword(ents, cfg.max_seq_length, t2s)


def _worker_model_scorer(cfg: PipelineConfig, space: LabelSpace):
    from text2nkg_spark.operators.model_scorer import ModelScorer

    key = (cfg.model_checkpoint, cfg.max_seq_length, cfg.max_pair_length,
           space.num_classes, cfg.model_variant)
    if key not in _WORKER_SCORERS:
        _WORKER_SCORERS[key] = ModelScorer(
            cfg.model_checkpoint, cfg.max_seq_length, cfg.max_pair_length,
            space.num_classes, variant=cfg.model_variant)
    return _WORKER_SCORERS[key]


def _sentence_logits(
    cfg: PipelineConfig,
    space: LabelSpace,
    doc_id: int,
    sent_idx: int,
    cand: np.ndarray,
    gold_rels: list | None,
    entities: np.ndarray | None = None,
    tokens: list[str] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    triples = cand[:, 4:10]
    c = space.num_classes
    if cfg.scorer == "gold":
        gi = gold_orderings(gold_rels or [], space.label_map())
        rel, qul = gold_logits(
            doc_id, sent_idx, triples, c, gi, cfg.hash_seed, cfg.gold_weight)
    elif cfg.scorer == "hash":
        rel = hash_logits(doc_id, sent_idx, triples, c, cfg.hash_seed, 0)
        qul = hash_logits(doc_id, sent_idx, triples, c, cfg.hash_seed, 1)
    elif cfg.scorer == "model":
        scorer = _worker_model_scorer(cfg, space)
        rel, qul = scorer.score_sentence(tokens or [], entities, cand)
    else:
        raise NotImplementedError(f"unknown scorer '{cfg.scorer}'")
    if cfg.log_softmax:
        rel = log_softmax(rel)
        qul = log_softmax(qul)
    return rel, qul


def _gold_rel_tuples(rels) -> list:
    """Normalize a gold relations cell to tuples.

    Accepts the to_json string contract from prepare_sentences (the fast
    Arrow path — one string per row instead of nested struct cells) as
    well as ndarray/list of Row/dict (direct callers and older tests)."""
    out = []
    if rels is None:
        return out
    if isinstance(rels, str):
        import json

        rels = json.loads(rels)
    for r in rels:
        d = r if isinstance(r, dict) else r.asDict(recursive=True)
        quals = d["quals"]
        out.append(
            (int(d["h_s"]), int(d["h_e"]), int(d["t_s"]), int(d["t_e"]),
             d["rel"],
             [(int(q["q_s"]), int(q["q_e"]), q["label"])
              for q in (quals if quals is not None else [])]))
    return out


def _mention_array(mentions) -> np.ndarray:
    if mentions is None or len(mentions) == 0:
        return np.empty((0, 2), dtype=np.int64)
    rows = [
        (int(m["start"]), int(m["end"])) if isinstance(m, dict)
        else (int(m.start), int(m.end))
        for m in mentions
    ]
    return np.asarray(rows, dtype=np.int64)


def _flat_mention_array(starts, ends) -> np.ndarray:
    """(starts, ends) int arrays -> (E, 2) span matrix (fast Arrow path)."""
    if starts is None or len(starts) == 0:
        return np.empty((0, 2), dtype=np.int64)
    return np.column_stack(
        [np.asarray(starts, dtype=np.int64), np.asarray(ends, dtype=np.int64)])


def extract_facts_fused(df, cfg: PipelineConfig, space: LabelSpace):
    """Fused scan→facts extraction.

    Input columns (flat Arrow-friendly contract — struct/token arrays cost
    ~2x in Arrow->pandas conversion): conv_id, turn_idx, text (string),
    m_starts (array<int>), m_ends (array<int>); plus gold_relations when
    cfg.scorer == 'gold'.  The legacy (tokens, mentions) contract is also
    accepted.
    """
    use_gold = cfg.scorer == "gold"
    flat = "m_starts" in df.columns
    identity = cfg.tokenizer == "identity"
    strict = identity  # pruned orderings only exist under wordpiece

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tokenizer = _make_tokenizer(cfg)
        for pdf in batches:
            out: list[tuple] = []
            conv_ids = pdf["conv_id"].to_numpy()
            turn_idxs = pdf["turn_idx"].to_numpy()
            if flat:
                text_col = pdf["text"].to_numpy()
                starts_col = pdf["m_starts"].to_numpy()
                ends_col = pdf["m_ends"].to_numpy()
            else:
                tokens_col = pdf["tokens"].to_numpy()
                mentions_col = pdf["mentions"].to_numpy()
            gold_col = pdf["gold_relations"].to_numpy() if use_gold else None

            # phase 1 — enumerate all sentences in the batch
            sent: list[tuple] = []  # (row, doc_id, ents, cand, lo, hi)
            pos = 0
            for r in range(len(pdf)):
                if flat:
                    ents = _flat_mention_array(starts_col[r], ends_col[r])
                else:
                    ents = _mention_array(mentions_col[r])
                if ents.shape[0] == 0:
                    continue
                if identity:
                    cand = enumerate_triples(ents, cfg.max_seq_length)
                else:
                    toks_r = (text_col[r].split(" ") if flat
                              else list(tokens_col[r]))
                    cand = _enumerate(cfg, ents, toks_r, tokenizer)
                if cand.shape[0] == 0:
                    continue
                sent.append((r, stable_doc_id(conv_ids[r]), ents, cand,
                             pos, pos + cand.shape[0]))
                pos += cand.shape[0]
            if not sent:
                yield _empty_fact_frame()
                continue

            # phase 2 — score the whole batch vectorized, in cache-sized
            # slices: every op is elementwise/row-wise so values are
            # identical, but a ~32k-candidate working set (~5 MB) stays
            # L2/L3-resident instead of streaming tens of MB through the
            # shared memory bus per batch — measurably better multi-worker
            # scaling on bandwidth-bound executors
            if cfg.scorer == "hash":
                all_triples = np.concatenate([s[3][:, 4:10] for s in sent])
                doc_arr = np.concatenate(
                    [np.full(s[5] - s[4], s[1], dtype=np.int64) for s in sent])
                sent_arr = np.concatenate(
                    [np.full(s[5] - s[4], int(turn_idxs[s[0]]), dtype=np.int64)
                     for s in sent])
                c = space.num_classes
                n_all = all_triples.shape[0]
                rel_all = np.empty((n_all, c), dtype=np.float32)
                q_all = np.empty((n_all, c), dtype=np.float32)
                step = 32768
                for lo_ in range(0, n_all, step):
                    sl = slice(lo_, min(lo_ + step, n_all))
                    r_ = hash_logits_batch(
                        doc_arr[sl], sent_arr[sl], all_triples[sl], c,
                        cfg.hash_seed, 0)
                    q_ = hash_logits_batch(
                        doc_arr[sl], sent_arr[sl], all_triples[sl], c,
                        cfg.hash_seed, 1)
                    if cfg.log_softmax:
                        r_ = log_softmax(r_)
                        q_ = log_softmax(q_)
                    rel_all[sl] = r_
                    q_all[sl] = q_
            else:
                rel_all = q_all = None

            # phase 3 — decode: hash-scored batches go through the
            # batched fast decoder (one tensor pipeline per entity-count
            # group — bit-identical outputs, see decode_sentences_batch),
            # other scorers keep the per-sentence loop
            batched = None
            if rel_all is not None:
                batched = decode_sentences_batch(
                    [(s_[2], s_[3], s_[4], s_[5]) for s_ in sent],
                    rel_all, q_all, space,
                    same_entity=cfg.same_entity, strict=strict,
                    unidirect=cfg.eval_unidirect)
            for si, (r, doc_id, ents, cand, lo, hi) in enumerate(sent):
                conv_id = conv_ids[r]
                turn_idx = int(turn_idxs[r])
                if batched is not None:
                    preds = batched[si]
                else:
                    gold = _gold_rel_tuples(gold_col[r]) if use_gold else None
                    toks = ((text_col[r].split(" ") if flat
                             else list(tokens_col[r]))
                            if cfg.scorer == "model" else None)
                    rel_lg, q_lg = _sentence_logits(
                        cfg, space, doc_id, turn_idx, cand, gold, ents, toks)
                    preds = decode_sentence(
                        ents, cand, rel_lg, q_lg, space, cfg.same_entity,
                        strict=strict, unidirect=cfg.eval_unidirect)
                if not preds:
                    continue
                tokens = (text_col[r].split(" ") if flat
                          else list(tokens_col[r]))
                for pi, p in enumerate(preds):
                    m1s, m1e, m2s, m2e, rel, m3s, m3e, qual, sc, qsc = p
                    out.append(
                        (conv_id, turn_idx, pi, m1s, m1e, m2s, m2e, rel,
                         m3s, m3e, qual, sc, qsc,
                         " ".join(tokens[m1s:m1e + 1]),
                         " ".join(tokens[m2s:m2e + 1]),
                         " ".join(tokens[m3s:m3e + 1])))
            yield pd.DataFrame(out, columns=_FACT_COLS)

    return df.mapInPandas(run, schema=FACT_SCHEMA)


_FACT_COLS = [
    "conv_id", "turn_idx", "pred_idx", "m1s", "m1e", "m2s", "m2e", "rel",
    "m3s", "m3e", "qual", "rel_score", "q_score", "subj", "obj", "value"]


def _empty_fact_frame() -> pd.DataFrame:
    return pd.DataFrame(columns=_FACT_COLS)


def split_dense_sentences(sents, max_cost: int = 1000):
    """Skew mitigation for the two-stage path (SURVEY.md §4 item 1).

    Candidate enumeration is O(E^3) per sentence; a mention-dense turn
    hot-spots whichever task holds it, and AQE cannot split inside a UDF
    group.  This pre-pass splits each sentence whose E^3 exceeds
    ``max_cost`` into several (sub_lo, sub_hi) subject-range rows BEFORE
    scoring, so the expensive model scoring spreads across executors; the
    per-sentence decode regroups the pieces (its input is the union of all
    subject ranges, which is exactly the full candidate grid).
    """
    from pyspark.sql import functions as F

    e = F.size("m_starts")
    cost = e * e * e
    n_chunks = F.when(cost > max_cost, F.least(
        F.ceil(cost / max_cost).cast("int"), e)).otherwise(F.lit(1))
    chunk_sz = F.ceil(e / n_chunks).cast("int")
    return (
        sents.withColumn("_nc", n_chunks)
        .withColumn("_cs", chunk_sz)
        .withColumn("_c", F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)))
        .withColumn("sub_lo", (F.col("_c") * F.col("_cs")).cast("int"))
        .withColumn(
            "sub_hi",
            F.least((F.col("_c") + 1) * F.col("_cs"), e).cast("int"))
        .where(F.col("sub_lo") < F.col("sub_hi"))
        .drop("_nc", "_cs", "_c")
    )


def score_candidates(df, cfg: PipelineConfig, space: LabelSpace):
    """Two-stage scoring: one output row per candidate triple with logits.

    Input as extract_facts_fused; optional sub_lo/sub_hi columns (from
    ``split_dense_sentences``) restrict each row to a subject range.  At
    scale, follow with ``.repartition(N, 'conv_id', 'turn_idx', 'sub_lo')``
    before an expensive model scorer.
    """
    use_gold = cfg.scorer == "gold"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tokenizer = _make_tokenizer(cfg)
        for pdf in batches:
            frames: list[pd.DataFrame] = []
            flat = "m_starts" in pdf.columns
            ranged = "sub_lo" in pdf.columns
            gold_col = pdf["gold_relations"] if use_gold else None
            for r in range(len(pdf)):
                conv_id = pdf["conv_id"].iat[r]
                turn_idx = int(pdf["turn_idx"].iat[r])
                if flat:
                    ents = _flat_mention_array(
                        pdf["m_starts"].iat[r], pdf["m_ends"].iat[r])
                else:
                    ents = _mention_array(pdf["mentions"].iat[r])
                if ents.shape[0] == 0:
                    continue
                if cfg.tokenizer == "identity":
                    cand = enumerate_triples(ents, cfg.max_seq_length)
                else:
                    toks_r = (pdf["text"].iat[r].split(" ") if flat
                              else list(pdf["tokens"].iat[r]))
                    cand = _enumerate(cfg, ents, toks_r, tokenizer)
                if ranged:
                    lo = int(pdf["sub_lo"].iat[r])
                    hi = int(pdf["sub_hi"].iat[r])
                    cand = cand[(cand[:, 1] >= lo) & (cand[:, 1] < hi)]
                if cand.shape[0] == 0:
                    continue
                doc_id = stable_doc_id(conv_id)
                gold = _gold_rel_tuples(gold_col.iat[r]) if use_gold else None
                toks = None
                if cfg.scorer == "model":
                    toks = (pdf["text"].iat[r].split(" ") if flat
                            else list(pdf["tokens"].iat[r]))
                rel_lg, q_lg = _sentence_logits(
                    cfg, space, doc_id, turn_idx, cand, gold, ents, toks)
                f = pd.DataFrame(
                    cand,
                    columns=["cand_idx", "i", "j", "k", "m1s", "m1e", "m2s",
                             "m2e", "m3s", "m3e"],
                )
                f.insert(0, "conv_id", conv_id)
                f.insert(1, "turn_idx", turn_idx)
                f["n_entities"] = ents.shape[0]
                f["rel_logits"] = list(rel_lg)
                f["q_logits"] = list(q_lg)
                frames.append(f)
            cols = ["conv_id", "turn_idx", "cand_idx", "i", "j", "k",
                    "m1s", "m1e", "m2s", "m2e", "m3s", "m3e",
                    "n_entities", "rel_logits", "q_logits"]
            if frames:
                yield pd.concat(frames, ignore_index=True)[cols]
            else:
                yield pd.DataFrame(columns=cols)

    return df.mapInPandas(run, schema=SCORE_SCHEMA)


def decode_scores(cand_df, cfg: PipelineConfig, space: LabelSpace):
    """Two-stage decode: group candidate rows per sentence, run the decode
    core, emit span-level predictions (texts joined back separately).
    """

    schema = (
        "conv_id string, turn_idx int, pred_idx int, "
        "m1s int, m1e int, m2s int, m2e int, rel string, "
        "m3s int, m3e int, qual string, rel_score double, q_score double"
    )

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        conv_id, turn_idx = key[0], int(key[1])
        pdf = pdf.sort_values("cand_idx", kind="stable")
        cand = pdf[["cand_idx", "i", "j", "k", "m1s", "m1e", "m2s", "m2e",
                    "m3s", "m3e"]].to_numpy(dtype=np.int64)
        rel_lg = np.stack(pdf["rel_logits"].to_numpy())
        q_lg = np.stack(pdf["q_logits"].to_numpy())
        e = int(pdf["n_entities"].iat[0])
        # reconstruct entity spans from candidate rows (subject slots)
        ents = np.zeros((e, 2), dtype=np.int64)
        ents[cand[:, 1], 0] = cand[:, 4]
        ents[cand[:, 1], 1] = cand[:, 5]
        ents[cand[:, 2], 0] = cand[:, 6]
        ents[cand[:, 2], 1] = cand[:, 7]
        preds = decode_sentence(
            ents, cand, rel_lg, q_lg, space, cfg.same_entity,
            strict=(cfg.tokenizer == "identity"),
            unidirect=cfg.eval_unidirect)
        rows = [
            (conv_id, turn_idx, pi, *p[:8], p[8], p[9])
            for pi, p in enumerate(preds)
        ]
        return pd.DataFrame(
            rows,
            columns=["conv_id", "turn_idx", "pred_idx", "m1s", "m1e", "m2s",
                     "m2e", "rel", "m3s", "m3e", "qual", "rel_score",
                     "q_score"],
        )

    return cand_df.groupBy("conv_id", "turn_idx").applyInPandas(run, schema)
