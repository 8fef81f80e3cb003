"""Serial parity oracle: a faithful pure-Python reimplementation of the
reference pipeline's semantics (back/kgg/generator.py:57-74 and the stage
modules), driven by the same deterministic backends as the Spark engine.

This plays the role the unchunked-baseline golden plays in the reference's
own quality harness (back/kgg/test/test3.py:228-249): the Spark pipeline's
output is compared against this oracle's triple set at P/R >= 0.95 (exact
match expected for the deterministic backends).

Intentional, documented divergences from the reference (also applied here so
both sides agree):
- deterministic sha256 ids instead of uuid4 (functions/ids.py);
- the (label, text) -> entity resolution dict keeps the FIRST (min start_idx)
  occurrence — the reference iterates a set (nondeterministic last-writer,
  back/kgg/nodes/relation_extraction.py:71).
"""

from __future__ import annotations

import hashlib
import json
import re
from dataclasses import dataclass, field

SEP = "\x1f"


def _sha(*parts) -> str:
    return hashlib.sha256(SEP.join(str(p) for p in parts).encode()).hexdigest()


def mention_id(doc_id, start, end, label):
    return _sha("mention", doc_id, start, end, label)


def relation_id(doc_id, head_mid, rel, tail_mid):
    return _sha("relation", doc_id, head_mid, rel, tail_mid)


def node_id(text):
    return _sha("node", text)


def chunk_words(text: str, size: int, stride: int):
    """Identical to knowledgegraphbuilder_spark.operators.chunk.chunk_words
    (kept independent on purpose: the oracle must not import the engine)."""
    words = text.split(" ")
    n = len(words)
    offs, pos = [], 0
    for w in words:
        offs.append(pos)
        pos += len(w) + 1
    out, i, ci = [], 0, 0
    while True:
        ws = words[i : i + size]
        out.append((ci, " ".join(ws), offs[i], i, len(ws)))
        if i + size >= n:
            break
        i += stride
        ci += 1
    return out


@dataclass
class OracleConfig:
    ner_chunk_size: int = 100
    ner_chunk_overlap: int = 15
    re_chunk_size: int = 300
    re_chunk_overlap: int = 30
    ner_threshold: float = 0.5
    gazetteer: dict = field(default_factory=lambda: {
        "spark": "technology",
        "vector": "technology",
        "customer": "organization",
        "stream": "system",
        "table": "resource",
    })


def gazetteer_scan(chunk_text: str, gaz: dict):
    ents, pos = [], 0
    for w in chunk_text.split(" "):
        if w in gaz:
            ents.append({"start": pos, "end": pos + len(w), "label": gaz[w],
                         "text": w, "score": 1.0})
        pos += len(w) + 1
    return ents


def extract_mentions(doc_id: str, text: str, cfg: OracleConfig):
    """Mirrors GLiNEREntitiesGenerator._extract_entities
    (back/kgg/nodes/entity_extraction.py:42-78): per-chunk scan, offset shift,
    first-seen dedup on (start, end, label)."""
    stride = cfg.ner_chunk_size - cfg.ner_chunk_overlap
    all_ents = []
    for _, ctext, coff, _, _ in chunk_words(text, cfg.ner_chunk_size, stride):
        for e in gazetteer_scan(ctext, cfg.gazetteer):
            if e["score"] < cfg.ner_threshold:
                continue
            all_ents.append({**e, "start": e["start"] + coff, "end": e["end"] + coff})
    seen, uniq = set(), []
    for e in all_ents:
        key = (e["start"], e["end"], e["label"])
        if key not in seen:
            seen.add(key)
            uniq.append(e)
    return [
        {**e, "doc_id": doc_id, "mention_id": mention_id(doc_id, e["start"], e["end"], e["label"])}
        for e in uniq
    ]


def template_response(ents_sorted):
    rels = []
    for a, b in zip(ents_sorted, ents_sorted[1:]):
        rels.append({
            "head": {"text": a["text"], "label": a["label"]},
            "tail": {"text": b["text"], "label": b["label"]},
            "relation": f"{a['label']}_near_{b['label']}",
            "description": f"{a['text']} ({a['label']}) co-occurs with {b['text']} ({b['label']})",
        })
    return "Here are the extracted relations:\n```json\n" + json.dumps(rels) + "\n```"


def extract_relations(doc_id: str, text: str, mentions, cfg: OracleConfig):
    """Mirrors RelationsGenerator._extract_relations + _parse_response
    (back/kgg/nodes/relation_extraction.py:35-106, dedup :138-144)."""
    stride = cfg.re_chunk_size - cfg.re_chunk_overlap
    label_text2entity = {}
    for e in sorted(mentions, key=lambda e: e["start"]):
        label_text2entity.setdefault((e["label"], e["text"]), e)  # min-start winner

    out, seen = [], set()
    for _, ctext, coff, _, _ in chunk_words(text, cfg.re_chunk_size, stride):
        chunk_entities = [
            e for e in mentions
            if e["start"] >= coff and e["end"] < coff + len(ctext)  # strict, ref :52
        ]
        if len(chunk_entities) < 2:
            continue
        ents_sorted = sorted(chunk_entities, key=lambda e: e["start"])
        resp = template_response(ents_sorted)
        m = re.search(r"```json\s*(.*?)\s*```", resp, re.DOTALL)
        if not m:
            continue
        for rel in json.loads(m.group(1)):
            head = label_text2entity.get((rel["head"]["label"], rel["head"]["text"]))
            tail = label_text2entity.get((rel["tail"]["label"], rel["tail"]["text"]))
            if not head or not tail:
                continue
            key = (head["mention_id"], rel["relation"], tail["mention_id"])
            if key in seen:
                continue
            seen.add(key)
            out.append({
                "relation_id": relation_id(doc_id, head["mention_id"], rel["relation"],
                                           tail["mention_id"]),
                "doc_id": doc_id,
                "head_mention_id": head["mention_id"],
                "tail_mention_id": tail["mention_id"],
                "rel_type": rel["relation"],
                "description": rel["description"],
                "head_text": rel["head"]["text"],
                "tail_text": rel["tail"]["text"],
            })
    return out


def run_oracle(docs: list[tuple[str, str]], cfg: OracleConfig | None = None):
    """Full serial pipeline over [(doc_id, text)]. Returns dict with mentions,
    relations, nodes (text -> sorted mention ids), and the triple set."""
    cfg = cfg or OracleConfig()
    mentions, relations = [], []
    for doc_id, text in docs:
        ms = extract_mentions(doc_id, text, cfg)
        mentions.extend(ms)
        relations.extend(extract_relations(doc_id, text, ms, cfg))
    nodes: dict[str, list] = {}
    for m in mentions:
        nodes.setdefault(m["text"], []).append(m["mention_id"])
    triples = {(r["head_text"], r["rel_type"], r["tail_text"]) for r in relations}
    return {
        "mentions": mentions,
        "relations": relations,
        "nodes": {t: sorted(v) for t, v in nodes.items()},
        "triples": triples,
    }


def precision_recall(predicted: set, golden: set):
    if not predicted and not golden:
        return 1.0, 1.0
    tp = len(predicted & golden)
    p = tp / len(predicted) if predicted else 0.0
    r = tp / len(golden) if golden else 0.0
    return p, r
