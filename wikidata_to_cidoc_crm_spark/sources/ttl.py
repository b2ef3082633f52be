"""Minimal Turtle reader/writer for test-scale golden comparison.

Supports the subset the reference's serializer emits (S5/S6 in SURVEY.md):
@prefix, IRIs, prefixed names, ``a``, ``;``/``,`` continuations, literals
with @lang / ^^datatype, and ``%`` escapes left verbatim. NOT a general
Turtle parser — no blank nodes/collections/multiline strings (the golden
files contain none). Triples come back as the canonical 6-tuple
``(subj, pred, obj, lang, dtype, obj_is_iri)`` — the IRI/literal flag is
carried so golden comparisons detect IRI-vs-literal drift (a seeAlso URL
emitted as a plain literal must NOT compare equal to the IRI form).
"""

from __future__ import annotations

import re

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_TOKEN = re.compile(
    r"""
      (?P<iri><[^>]*>)
    | (?P<literal>"(?:[^"\\]|\\.)*"(?:@[A-Za-z-]+|\^\^(?:<[^>]*>|[^\s;,.]+))?)
    | (?P<punct>[;,.])
    | (?P<pname>[^\s;,]+)
    """,
    re.VERBOSE,
)


def _strip_comments(text: str) -> str:
    out = []
    for line in text.splitlines():
        in_iri = in_str = False
        for i, ch in enumerate(line):
            if ch == '"' and not in_iri:
                in_str = not in_str
            elif ch == "<" and not in_str:
                in_iri = True
            elif ch == ">" and not in_str:
                in_iri = False
            elif ch == "#" and not in_str and not in_iri:
                line = line[:i]
                break
        out.append(line)
    return "\n".join(out)


def parse_ttl(text: str) -> set[tuple]:
    text = _strip_comments(text)
    prefixes: dict[str, str] = {}
    triples: set[tuple] = set()

    # extract @prefix lines
    body_lines = []
    for line in text.splitlines():
        m = re.match(r"\s*@prefix\s+([A-Za-z0-9_-]*):\s*<([^>]*)>\s*\.", line)
        if m:
            prefixes[m.group(1)] = m.group(2)
        else:
            body_lines.append(line)
    body = "\n".join(body_lines)

    def expand(tok: str) -> str:
        if tok.startswith("<"):
            return tok[1:-1]
        if tok == "a":
            return RDF_TYPE
        if ":" in tok:
            p, local = tok.split(":", 1)
            if p in prefixes:
                return prefixes[p] + local
        return tok

    def parse_object(tok: str):
        if tok.startswith('"'):
            m = re.match(r'^"((?:[^"\\]|\\.)*)"(?:@([A-Za-z-]+)|\^\^(<[^>]*>|\S+))?$', tok)
            val = m.group(1).replace('\\"', '"').replace("\\\\", "\\")
            lang = m.group(2)
            dtype = expand(m.group(3)) if m.group(3) else None
            return (val, lang, dtype, False)
        return (expand(tok), None, None, True)

    tokens = [m.group(0) for m in _TOKEN.finditer(body)]
    i = 0
    subj = pred = None
    state = "subj"
    while i < len(tokens):
        tok = tokens[i]
        i += 1
        if tok == ".":
            state = "subj"
            continue
        if tok == ";":
            state = "pred"
            continue
        if tok == ",":
            state = "obj"
            continue
        if state == "subj":
            subj = expand(tok)
            state = "pred"
        elif state == "pred":
            pred = expand(tok)
            state = "obj"
        elif state == "obj":
            val, lang, dtype, is_iri = parse_object(tok)
            triples.add((subj, pred, val, lang, dtype, is_iri))
            state = "after_obj"
        elif state == "after_obj":
            # an object token directly after another (shouldn't happen in
            # well-formed turtle without , ; .) — treat as new object
            val, lang, dtype, is_iri = parse_object(tok)
            triples.add((subj, pred, val, lang, dtype, is_iri))
    return triples


def parse_ttl_file(path: str) -> set[tuple]:
    with open(path, encoding="utf-8") as f:
        return parse_ttl(f.read())


def write_ttl(triples, path: str) -> None:
    """Test-scale Turtle writer (N-Triples-ish, valid Turtle)."""
    def fmt_obj(o, lang, dtype, is_iri):
        if is_iri:
            return f"<{o}>"
        s = o.replace("\\", "\\\\").replace('"', '\\"')
        if lang:
            return f'"{s}"@{lang}'
        if dtype:
            return f'"{s}"^^<{dtype}>'
        return f'"{s}"'

    with open(path, "w", encoding="utf-8") as f:
        for t in sorted(triples, key=lambda t: tuple("" if v is None else str(v) for v in t)):
            s, p, o = t[0], t[1], t[2]
            lang = t[3] if len(t) > 3 else None
            dtype = t[4] if len(t) > 4 else None
            if len(t) > 5:
                is_iri = bool(t[5])
            else:
                # legacy 3/5-tuple input: fall back to the prefix heuristic
                is_iri = lang is None and dtype is None and (
                    o.startswith("http://") or o.startswith("https://"))
            f.write(f"<{s}> <{p}> {fmt_obj(o, lang, dtype, is_iri)} .\n")
