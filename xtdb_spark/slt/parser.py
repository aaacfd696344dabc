"""SLT script parser.

Record grammar per the public sqllogictest format, matching the
reference's parser semantics exactly (runner.clj:53-115):

- records are blank-line separated; `#` comments are stripped per
  line BEFORE grouping (runner.clj:111 — including inside SQL text,
  which is what the reference does, so we match it);
- `statement ok|error` followed by statement lines;
- `query <types> [sort-mode] [label]` followed by query lines,
  `----`, then either inline expected values (one per line) or
  `N values hashing to <md5>`;
- `skipif <db>` / `onlyif <db>` prefix lines attach to the record;
- `hash-threshold N`, `halt`, `variable SET <var> TO <value>`.
"""

from __future__ import annotations

import re

_HASH_RE = re.compile(r"^(\d+) values hashing to ([0-9a-fA-F]{32})$")
_COMMENT_RE = re.compile(r"\s*#.+$")

_SORT_MODES = {"nosort", "rowsort", "valuesort"}


def _parse_record(lines: list[str], lineno: int, file: str) -> dict:
    head = lines[0]
    parts = head.split()
    kw = parts[0]

    if kw == "skipif":
        rec = _parse_record(lines[1:], lineno, file)
        rec.setdefault("skipif", []).append(parts[1])
        return rec
    if kw == "onlyif":
        rec = _parse_record(lines[1:], lineno, file)
        rec["onlyif"] = parts[1]
        return rec
    if kw == "halt":
        return {"type": "halt", "line": lineno, "file": file}
    if kw == "hash-threshold":
        return {"type": "hash-threshold", "max": int(parts[1]),
                "line": lineno, "file": file}
    if kw == "variable":
        # `variable SET <var> TO <value>` (runner.clj:100-104)
        return {"type": "variable", "variable": parts[2],
                "value": parts[4], "line": lineno, "file": file}
    if kw == "statement":
        mode = parts[1]
        assert mode in ("ok", "error"), f"{file}:{lineno}: bad mode {mode}"
        body = lines[1:]
        # some reference-authored scripts terminate statements with a
        # query-style `----` separator (direct-sql/sl-demo:561) — it
        # is not part of the SQL
        if "----" in body:
            body = body[:body.index("----")]
        return {"type": "statement", "mode": mode,
                "statement": "\n".join(body),
                "line": lineno, "file": file}
    if kw == "query":
        type_string = parts[1] if len(parts) > 1 else "T"
        sort_mode = parts[2] if len(parts) > 2 else "nosort"
        label = parts[3] if len(parts) > 3 else None
        assert sort_mode in _SORT_MODES, \
            f"{file}:{lineno}: bad sort mode {sort_mode}"
        assert re.fullmatch(r"[TIR]+", type_string), \
            f"{file}:{lineno}: bad type string {type_string}"
        body = lines[1:]
        try:
            sep = body.index("----")
            qlines, rlines = body[:sep], body[sep + 1:]
        except ValueError:
            qlines, rlines = body, []
        rec = {"type": "query", "query": "\n".join(qlines),
               "type_string": type_string, "sort_mode": sort_mode,
               "label": label, "line": lineno, "file": file}
        m = _HASH_RE.match(rlines[0]) if len(rlines) == 1 else None
        if m:
            rec["result_set_size"] = int(m.group(1))
            rec["md5"] = m.group(2).lower()
        else:
            rec["result_set_size"] = len(rlines)
            rec["result_set"] = "\n".join(rlines) + "\n"
        return rec
    raise ValueError(f"{file}:{lineno}: unknown record head {head!r}")


def parse_script(text: str, file: str = "") -> list[dict]:
    groups: list[tuple[int, list[str]]] = []
    cur: list[str] = []
    cur_start = 0
    for i, raw in enumerate(text.splitlines()):
        line = _COMMENT_RE.sub("", raw)
        if line.strip() == "":
            if cur:
                groups.append((cur_start, cur))
                cur = []
            continue
        if not cur:
            cur_start = i + 1
        cur.append(line)
    if cur:
        groups.append((cur_start, cur))
    return [_parse_record(lines, ln, file) for ln, lines in groups]
