"""Reference-decode oracle — a faithful, dict-based transcription of the
reference's hyperrelation eval decode (/root/reference/run_re.py:1293-1448),
fact projection (run_re.py:2351-2392), compaction (2394-2429) and exact-match
scoring (2431-2505).

This module is deliberately written in the reference's imperative style
(insertion-ordered dicts, python lists) and is used ONLY in tests/benchmark
oracles: the Spark pipeline must emit identical facts from identical logits.
It never runs on executors.
"""

from __future__ import annotations

import json

import numpy as np

from text2nkg_spark.labels import LabelSpace

Span = tuple[int, int]


def decode_sentence(
    pair_dict: dict[tuple[Span, Span, Span], tuple[list[float], str, list[float], str]],
    space: LabelSpace,
    same_entity: bool = False,
    strict: bool = True,
    unidirect: bool = False,
) -> list[tuple[Span, Span, str, Span, str]]:
    """Decode one sentence's ordered score dict into output_preds.

    ``pair_dict`` must be insertion-ordered by candidate enumeration order.
    ``strict=True`` requires all 6 orderings of every unordered span triple
    (the reference asserts this: run_re.py:1328-1386 — a KeyError here IS
    that assert); ``strict=False`` marks the present orderings visited and
    skips incomplete triples, mirroring decode_core's non-strict path for
    subword-pruned candidate sets (where the reference would crash).
    Returns the reference's ``output_preds``: (m1, m2, rel_name, m3, qual_name)
    per surviving NMS item, duplicates included (run_re.py:1493).

    ``unidirect=True`` is the ``--eval_unidirect`` ablation (run_re.py:1291,
    2652): NO 6-permutation ensemble — every ordering keeps its own raw
    logits and decodes independently (no visited-set collapse), with the
    direction normalization and NMS unchanged.  The reference keeps this
    branch for ablation studies (its pair-level body survives only as the
    commented block at run_re.py:2176-2266; ``if not args.eval_unidirect``
    gates the ensembled decode).
    """
    label_list = space.label_list
    q_label_list = space.label_list
    num_label = space.num_label
    num_q_label = space.num_label
    n_sym = 1  # sym_labels == ['NIL']

    def swap(v: list[float]) -> list[float]:
        return v[:n_sym] + v[num_label:] + v[n_sym:num_label]

    visited: set[tuple[Span, Span, Span]] = set()
    sentence_results: list[tuple] = []

    for k123, (v123, v1_ner_label, q123, _qn) in pair_dict.items():
        if k123 in visited:
            continue
        visited.add(k123)
        v = list(v123)
        q = list(q123)
        m1, m2, m3 = k123

        # run_re.py:1314-1316 — degenerate triples bail out BEFORE the five
        # permutation fetches, so only the base key is marked visited.
        if not same_entity:
            if m1 == m2 or m2 == m3 or m3 == m1:
                continue

        if unidirect:
            # ablation: no ensemble, no permutation visits — this ordering
            # decodes on its own raw logits
            v1_ner_label = v2_ner_label = v3_ner_label = "Entity"
            pred_label = int(np.argmax(v))
            q_pred_label = int(np.argmax(q))
            if pred_label > 0 and q_pred_label > 0:
                if pred_label >= num_label:
                    pred_label = pred_label - num_label + n_sym
                    m1, m2, m3 = m2, m1, m3
                if q_pred_label >= num_q_label:
                    m1, m2, m3 = m3, m1, m2
                    temp = pred_label
                    pred_label = q_pred_label - num_q_label + n_sym
                    q_pred_label = temp
                if label_list[pred_label].startswith("[k]"):
                    if q_label_list[q_pred_label].startswith("[k]"):
                        continue
                    m1, m2, m3 = m1, m3, m2
                    pred_label, q_pred_label = q_pred_label, pred_label
                if (label_list[pred_label].startswith("[r]")
                        and q_label_list[q_pred_label].startswith("[r]")):
                    continue
                sentence_results.append(
                    (v[pred_label], m1, m2, pred_label, v1_ner_label,
                     v2_ner_label, q[q_pred_label], m3, q_pred_label,
                     "Entity"))
            continue

        if not strict:
            perms = ((m2, m1, m3), (m1, m3, m2), (m2, m3, m1),
                     (m3, m1, m2), (m3, m2, m1))
            ok = all(p in pair_dict for p in perms)
            if not ok:
                # mirror decode_core: every ordering is marked visited,
                # the triple is skipped (no logits consumed)
                visited.update(perms)
                continue

        k213 = (m2, m1, m3)
        v213, v2_ner_label, q213, _ = pair_dict[k213]
        visited.add(k213)
        v213 = swap(list(v213))
        v = [a + b for a, b in zip(v, v213)]
        q = [a + b for a, b in zip(q, q213)]

        k132 = (m1, m3, m2)
        v132, _, q132, _ = pair_dict[k132]
        visited.add(k132)
        v = [a + b for a, b in zip(v, q132)]
        q = [a + b for a, b in zip(q, v132)]

        k231 = (m2, m3, m1)
        v231, _, q231, _ = pair_dict[k231]
        visited.add(k231)
        v = [a + b for a, b in zip(v, q231)]
        q = [a + b for a, b in zip(q, swap(list(v231)))]

        k312 = (m3, m1, m2)
        v312, v3_ner_label, q312, _ = pair_dict[k312]
        visited.add(k312)
        v = [a + b for a, b in zip(v, swap(list(q312)))]
        q = [a + b for a, b in zip(q, v312)]

        k321 = (m3, m2, m1)
        v321, _, q321, _ = pair_dict[k321]
        visited.add(k321)
        v = [a + b for a, b in zip(v, v321)]
        q = [a + b for a, b in zip(q, swap(list(q321)))]

        pred_label = int(np.argmax(v))
        q_pred_label = int(np.argmax(q))
        if pred_label > 0 and q_pred_label > 0:
            if pred_label >= num_label:
                pred_label = pred_label - num_label + n_sym
                m1, m2, m3 = m2, m1, m3
                v1_ner_label, v2_ner_label = v2_ner_label, v1_ner_label

            if q_pred_label >= num_q_label:
                m1, m2, m3 = m3, m1, m2
                temp = pred_label
                pred_label = q_pred_label - num_q_label + n_sym
                q_pred_label = temp
                v1_ner_label, v2_ner_label, v3_ner_label = (
                    v3_ner_label, v1_ner_label, v2_ner_label)

            if label_list[pred_label].startswith("[k]"):
                if q_label_list[q_pred_label].startswith("[k]"):
                    continue
                m1, m2, m3 = m1, m3, m2
                pred_label, q_pred_label = q_pred_label, pred_label
                v1_ner_label, v2_ner_label, v3_ner_label = (
                    v1_ner_label, v3_ner_label, v2_ner_label)

            if label_list[pred_label].startswith("[r]"):
                if q_label_list[q_pred_label].startswith("[r]"):
                    continue

            pred_score = v[pred_label]
            q_pred_score = q[q_pred_label]
            sentence_results.append(
                (pred_score, m1, m2, pred_label, v1_ner_label, v2_ner_label,
                 q_pred_score, m3, q_pred_label, "Entity"))

    sentence_results.sort(key=lambda x: -x[0])

    def is_overlap(a: Span, b: Span) -> bool:
        if b[0] <= a[0] <= b[1]:
            return True
        if a[0] <= b[0] <= a[1]:
            return True
        return False

    no_overlap: list[tuple] = []
    for item in sentence_results:
        m1, m2, m3 = item[1], item[2], item[-3]
        clash = False
        for x in no_overlap:
            if (item[3] == x[3] and is_overlap(m1, x[1]) and is_overlap(m2, x[2])
                    and item[-2] == x[-2] and is_overlap(m3, x[-3])):
                clash = True
                break
        if not clash:
            no_overlap.append(item)

    output_preds: list[tuple[Span, Span, str, Span, str]] = []
    for item in no_overlap:
        output_preds.append(
            (item[1], item[2], label_list[item[3]], item[-3],
             q_label_list[item[-2]]))
    return output_preds


def span_text(tokens: list[str], span: Span) -> str:
    """Space-joined inclusive token slice (run_re.py:2378-2386)."""
    return " ".join(tokens[span[0]: span[1] + 1])


def gran_facts(
    tokens: list[str],
    output_preds: list[tuple[Span, Span, str, Span, str]],
) -> list[str]:
    """One JSON fact line per prediction (run_re.py:2372-2389)."""
    out = []
    for m1, m2, rel, m3, qual in output_preds:
        hyper = {"N": 3, "relation": rel, "subject": span_text(tokens, m1),
                 "object": span_text(tokens, m2), qual: [span_text(tokens, m3)]}
        out.append(json.dumps(hyper))
    return out


def compact_facts(fact_lines: list[str]) -> list[str]:
    """Merge facts sharing relation+subject+object (run_re.py:2400-2423)."""
    hy_map: dict[str, list[dict]] = {}
    for line in fact_lines:
        d = json.loads(line)
        rso = d["relation"] + d["subject"] + d["object"]
        hy_map.setdefault(rso, []).append(d)
    out = []
    for _rso, ds in hy_map.items():
        t_d: dict = {"N": 0}
        ext = 0
        for d in ds:
            for k, v in d.items():
                if k in t_d and k not in ("relation", "subject", "object", "N"):
                    t_d[k] += v
                    ext += 1
                else:
                    t_d[k] = v
        t_d["N"] = len(t_d) - 2 + ext
        out.append(json.dumps(t_d))
    return out


def gold_compact_facts(
    tokens: list[str],
    relations: list[tuple[int, int, int, int, str, list[tuple[int, int, str]]]],
) -> list[str]:
    """Gold-side compacted fact strings (run_re.py:2445-2472).

    NOTE the reference accumulates ``att`` across qualifiers of a relation
    without resetting (run_re.py:2449 initialized outside the loop) — each
    qualifier value is the concatenation of all earlier qualifier texts in
    that relation.  Preserved faithfully (known reference quirk).
    """
    out = []
    for hs, he, ts, te, rel, quals in relations:
        t: dict = {"N": 0}
        t["relation"] = rel
        t["subject"] = span_text(tokens, (hs, he))
        t["object"] = span_text(tokens, (ts, te))
        ext = 0
        att = ""
        for qs, qe, qual in quals:
            for index in range(qs, qe):
                att = att + tokens[index] + " "
            att = att + tokens[qe]
            if qual in t:
                t[qual] += [att]
                ext += 1
            else:
                t[qual] = [att]
        t["N"] = len(t) - 2 + ext
        out.append(json.dumps(t))
    return out


# ---------------------------------------------------------------------------
# event / role / hypergraph decode transcriptions
# (run_re.py:1519-1751, 1764-1975, 1979-2174)
# ---------------------------------------------------------------------------

def decode_sentence_event(
    pair_dict: dict,
    label_list: list[str],
    q_label_list: list[str],
    same_entity: bool = False,
) -> list[tuple]:
    """Event-schema decode.  pair_dict values are
    (v, ner, q, qner, qb, qc) logit lists; four heads, no block swaps —
    permutations shuffle the (q, qb, qc) heads to follow their mentions.
    Returns output_preds rows
    (rel, (m1, qb_lab), (m2, qc_lab), (m3, q_lab)).
    """
    visited: set = set()
    sentence_results: list[tuple] = []
    for k123, (v123, v1n, q123, _qn, qb123, qc123) in pair_dict.items():
        if k123 in visited:
            continue
        visited.add(k123)
        v, q = list(v123), list(q123)
        qb, qc = list(qb123), list(qc123)
        m1, m2, m3 = k123
        if not same_entity and (m1 == m2 or m2 == m3 or m3 == m1):
            continue
        # (key, v-src, q-src, qb-src, qc-src) with sources named by head
        for key, perm in (
            ((m2, m1, m3), lambda t: (t[0], t[1], t[3], t[2])),
            ((m1, m3, m2), lambda t: (t[0], t[3], t[2], t[1])),
            ((m2, m3, m1), lambda t: (t[0], t[2], t[3], t[1])),
            ((m3, m1, m2), lambda t: (t[0], t[3], t[1], t[2])),
            ((m3, m2, m1), lambda t: (t[0], t[2], t[1], t[3])),
        ):
            vp, _n, qp, _qn2, qbp, qcp = pair_dict[key]
            visited.add(key)
            av, aq, aqb, aqc = perm((vp, qp, qbp, qcp))
            v = [a + b for a, b in zip(v, av)]
            q = [a + b for a, b in zip(q, aq)]
            qb = [a + b for a, b in zip(qb, aqb)]
            qc = [a + b for a, b in zip(qc, aqc)]
        pred = int(np.argmax(v)); q_pred = int(np.argmax(q))
        qb_pred = int(np.argmax(qb)); qc_pred = int(np.argmax(qc))
        # run_re.py:1637 — note qb tested for TRUTHINESS, not > 0 (quirk)
        if pred > 0 and q_pred > 0 and qb_pred and qc_pred > 0:
            sentence_results.append(
                (v[pred], m1, m2, pred, q[q_pred], m3, q_pred, qb_pred, qc_pred))

    sentence_results.sort(key=lambda x: -x[0])

    def ov(a, b):
        return (b[0] <= a[0] <= b[1]) or (a[0] <= b[0] <= a[1])

    kept: list[tuple] = []
    for it in sentence_results:
        clash = any(
            it[3] == x[3] and ov(it[1], x[1]) and ov(it[2], x[2])
            and it[6] == x[6] and ov(it[5], x[5])
            and it[7] == x[7] and it[8] == x[8]
            for x in kept)
        if not clash:
            kept.append(it)
    out = []
    for _s, m1, m2, pred, _qs, m3, q_pred, qb_pred, qc_pred in kept:
        out.append(
            (label_list[pred],
             (m1, q_label_list[qb_pred]),
             (m2, q_label_list[qc_pred]),
             (m3, q_label_list[q_pred])))
    return out


def decode_sentence_role(
    pair_dict: dict,
    q_label_list: list[str],
    same_entity: bool = False,
) -> list[tuple]:
    """Role-schema decode.  pair_dict values: (v, ner, q, qner, qb);
    v = m2's role, q = m3's role, qb = m1's role.
    Returns ((m1, qb_lab), (m2, v_lab), (m3, q_lab)) rows."""
    visited: set = set()
    sentence_results: list[tuple] = []
    for k123, (v123, _n, q123, _qn, qb123) in pair_dict.items():
        if k123 in visited:
            continue
        visited.add(k123)
        v, q, qb = list(v123), list(q123), list(qb123)
        m1, m2, m3 = k123
        if not same_entity and (m1 == m2 or m2 == m3 or m3 == m1):
            continue
        for key, perm in (
            ((m2, m1, m3), lambda t: (t[2], t[1], t[0])),
            ((m1, m3, m2), lambda t: (t[1], t[0], t[2])),
            ((m2, m3, m1), lambda t: (t[2], t[0], t[1])),
            ((m3, m1, m2), lambda t: (t[2], t[0], t[1])),
            ((m3, m2, m1), lambda t: (t[0], t[1], t[2])),
        ):
            vp, _n2, qp, _qn2, qbp = pair_dict[key]
            visited.add(key)
            av, aq, aqb = perm((vp, qp, qbp))
            v = [a + b for a, b in zip(v, av)]
            q = [a + b for a, b in zip(q, aq)]
            qb = [a + b for a, b in zip(qb, aqb)]
        pred = int(np.argmax(v)); q_pred = int(np.argmax(q))
        qb_pred = int(np.argmax(qb))
        # run_re.py:1870 — qb tested for truthiness (quirk)
        if pred > 0 and q_pred > 0 and qb_pred:
            sentence_results.append(
                (v[pred], m1, m2, pred, q[q_pred], m3, q_pred, qb_pred))

    sentence_results.sort(key=lambda x: -x[0])

    def ov(a, b):
        return (b[0] <= a[0] <= b[1]) or (a[0] <= b[0] <= a[1])

    kept: list[tuple] = []
    for it in sentence_results:
        clash = any(
            it[3] == x[3] and ov(it[1], x[1]) and ov(it[2], x[2])
            and it[6] == x[6] and ov(it[5], x[5]) and it[7] == x[7]
            for x in kept)
        if not clash:
            kept.append(it)
    out = []
    for _s, m1, m2, pred, _qs, m3, q_pred, qb_pred in kept:
        out.append(
            ((m1, q_label_list[qb_pred]),
             (m2, q_label_list[pred]),
             (m3, q_label_list[q_pred])))
    return out


def decode_sentence_hypergraph(
    pair_dict: dict,
    label_list: list[str],
    same_entity: bool = False,
) -> list[tuple]:
    """Hypergraph decode: all 6 orderings summed with NO permutation;
    q_pred = argmax(v) — the reference reads v twice (run_re.py:2121, quirk).
    Returns (rel, m1, m2, m3) rows."""
    visited: set = set()
    sentence_results: list[tuple] = []
    for k123, (v123, _n, q123, _qn) in pair_dict.items():
        if k123 in visited:
            continue
        visited.add(k123)
        v, q = list(v123), list(q123)
        m1, m2, m3 = k123
        if not same_entity and (m1 == m2 or m2 == m3 or m3 == m1):
            continue
        for key in ((m2, m1, m3), (m1, m3, m2), (m2, m3, m1),
                    (m3, m1, m2), (m3, m2, m1)):
            vp, _n2, qp, _qn2 = pair_dict[key]
            visited.add(key)
            v = [a + b for a, b in zip(v, vp)]
            q = [a + b for a, b in zip(q, qp)]
        pred = int(np.argmax(v))
        q_pred = int(np.argmax(v))  # quirk preserved
        if pred > 0:
            sentence_results.append(
                (v[pred], m1, m2, pred, q[q_pred], m3, q_pred))

    sentence_results.sort(key=lambda x: -x[0])

    def ov(a, b):
        return (b[0] <= a[0] <= b[1]) or (a[0] <= b[0] <= a[1])

    kept: list[tuple] = []
    for it in sentence_results:
        clash = any(
            it[3] == x[3] and ov(it[1], x[1]) and ov(it[2], x[2])
            and it[6] == x[6] and ov(it[5], x[5])
            for x in kept)
        if not clash:
            kept.append(it)
    return [(label_list[it[3]], it[1], it[2], it[5]) for it in kept]
