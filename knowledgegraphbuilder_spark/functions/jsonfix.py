"""F6: tolerant label-list parsing with JSON repair.

Reference flow (back/kgg/nodes/ner_labels_generator.py:63-91): bracket-regex
extract -> newline squash -> ``repair_json`` -> ``json.loads``; on failure a
quote-aware token fallback (``'[^']*'|"[^"]*"|[^,]+``), both branches
normalizing ``str(label).lower().strip().replace(" ", "_")``.

``repair_json_array`` is a from-scratch minimal repairer for the scalar-array
shape this stage produces (the reference's third-party ``json_repair`` is a
general-purpose library; labels are flat lists, so the repair surface here is
quotes, trailing commas, and bare tokens):

- single-quoted strings -> double-quoted (inner double quotes escaped)
- bare tokens -> double-quoted unless they parse as number/true/false/null
- trailing / doubled commas dropped
"""

from __future__ import annotations

import json
import re

_BRACKET_RE = re.compile(r"\[.*?]", re.DOTALL)
_FALLBACK_ITEM_RE = re.compile(r"'[^']*'|\"[^\"]*\"|[^,]+")
_NUMBER_RE = re.compile(r"-?\d+(\.\d+)?([eE][+-]?\d+)?$")


def repair_json_array(s: str) -> str:
    """Best-effort rewrite of a malformed scalar JSON array into valid JSON."""
    out: list[str] = []
    items: list[str] = []
    i = 0
    n = len(s)
    start = s.find("[")
    end = s.rfind("]")
    if start < 0 or end <= start:
        raise ValueError("not an array")
    body = s[start + 1 : end]
    i, n = 0, len(body)
    while i < n:
        c = body[i]
        if c in " \t\r\n,":
            i += 1
            continue
        if c in "'\"":
            quote = c
            j = i + 1
            raw = []
            while j < n and body[j] != quote:
                if body[j] == "\\" and j + 1 < n:
                    raw.append(body[j : j + 2])
                    j += 2
                    continue
                raw.append(body[j])
                j += 1
            content = "".join(raw)
            if quote == "'":
                # single->double quoted: unescape \' , escape bare "
                content = content.replace("\\'", "'").replace('"', '\\"')
            # valid JSON escapes (\uXXXX, \n, ...) pass through verbatim;
            # an invalid escape makes json.loads fail -> token fallback
            items.append('"' + content + '"')
            i = j + 1
        else:
            j = i
            while j < n and body[j] != ",":
                j += 1
            tok = body[i:j].strip()
            if tok:
                if tok in ("true", "false", "null") or _NUMBER_RE.match(tok):
                    items.append(tok)
                else:
                    items.append(json.dumps(tok))
            i = j
    out.append("[")
    out.append(", ".join(items))
    out.append("]")
    return "".join(out)


def _normalize(label) -> str:
    return str(label).lower().strip().replace(" ", "_")


def parse_label_list(text: str) -> list[str]:
    """Full reference parse chain -> sorted distinct normalized labels."""
    if not text:
        return []
    m = _BRACKET_RE.search(text)
    if not m:
        return []
    json_str = m.group(0).replace("\n", " ")
    try:
        labels = json.loads(repair_json_array(json_str))
        return sorted({
            _normalize(lb) for lb in labels
            if isinstance(lb, (str, int, float)) and _normalize(lb)
        })
    except Exception:
        content = m.group(0).strip("[]")
        out = set()
        for item in _FALLBACK_ITEM_RE.findall(content):
            item = item.strip().strip("'\"").strip()
            if item:
                out.add(_normalize(item))
        return sorted(o for o in out if o)
