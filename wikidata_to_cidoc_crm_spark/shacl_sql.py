"""SHACL validation compiled to ANSI SQL — the DuckDB twin of ``shacl.py``.

``shacl.validate`` re-expresses the reference's pySHACL constraint surface
as distributed DataFrame checks; this module generates the SAME checks as
one self-contained ANSI-SQL query (DuckDB dialect) over a triple table
embedded as VALUES. Used by the driver contract's ``kg_validate`` oracle:
the triples come from the pure-Python reference-semantics oracles (no
Spark involved), the shapes are the same transcribed ``Shape`` tables
(``shapes_spec.py``), so DuckDB independently recomputes every per-module
violation count that the Spark validator reports.

Constraint-name strings are built with the exact same rules as
``shacl.validate`` so the (module, shape, constraint) keys align
bit-for-bit.
"""

from __future__ import annotations

from .model import RDF_TYPE
from .shacl import Prop, Shape


def _q(s: str) -> str:
    """SQL string literal."""
    return "'" + s.replace("'", "''") + "'"


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    return _q(str(v))


def _cname(p: Prop) -> str:
    # mirror shacl.validate: last URI segment after '/', '#', ':'
    base = p.path.rsplit("/", 1)[-1].rsplit("#", 1)[-1].rsplit(":", 1)[-1]
    return ("^" if p.inverse else "") + base


def _focus_sql(module: str, shape: Shape) -> str:
    m = _q(module)
    t = _q(shape.target)
    if shape.target_kind == "class":
        return f"SELECT focus FROM typed WHERE module = {m} AND cls = {t}"
    if shape.target_kind == "node":
        return f"SELECT focus FROM nodes WHERE module = {m} AND focus = {t}"
    if shape.target_kind == "prefix":
        return (f"SELECT focus FROM nodes WHERE module = {m} "
                f"AND starts_with(focus, {t})")
    raise ValueError(shape.target_kind)


def validation_summary_sql(
    modules: list[tuple[str, set[tuple], list[Shape]]],
) -> str:
    """(module, triples, shapes) list → one SQL query returning
    ``(module, shape, constraint, n_violations)`` for violated constraints.

    ``triples`` rows are ``(subj, pred, obj, lang, dtype, obj_is_iri)``
    6-tuples (the pure-Python oracle format).
    """
    # --- VALUES table (sorted for deterministic SQL text) ---
    rows = []
    for module, triples, _ in modules:
        for (s, p, o, lang, dtype, is_iri) in sorted(
                triples, key=lambda t: tuple("" if v is None else str(v) for v in t)):
            rows.append(f"({_q(module)},{_q(s)},{_q(p)},{_q(o)},"
                        f"{_lit(bool(is_iri))},{_lit(lang)},{_lit(dtype)})")
    values = ",\n    ".join(rows)

    ctes = [
        f"""t AS MATERIALIZED (
  SELECT module, subj, pred, obj,
         CAST(obj_is_iri AS BOOLEAN) AS obj_is_iri,
         CAST(lang AS VARCHAR) AS lang, CAST(dtype AS VARCHAR) AS dtype
  FROM (VALUES
    {values}
  ) raw(module, subj, pred, obj, obj_is_iri, lang, dtype)
)""",
        f"""typed AS MATERIALIZED (
  SELECT DISTINCT module, subj AS focus, obj AS cls
  FROM t WHERE pred = {_q(RDF_TYPE)}
)""",
        """nodes AS MATERIALIZED (
  SELECT DISTINCT module, focus FROM (
    SELECT module, subj AS focus FROM t
    UNION ALL
    SELECT module, obj AS focus FROM t WHERE obj_is_iri
  ) u
)""",
    ]
    selects: list[str] = []

    for mi, (module, _triples, shapes) in enumerate(modules):
        m = _q(module)
        by_name = {s.name: s for s in shapes}

        def member_sql(ref: Shape) -> str:
            return _focus_sql(module, ref)

        for si, shape in enumerate(shapes):
            fid = f"f_{mi}_{si}"
            ctes.append(f"{fid} AS MATERIALIZED ({_focus_sql(module, shape)})")
            sh = _q(shape.name)

            for pi, p in enumerate(shape.props):
                eid = f"e_{mi}_{si}_{pi}"
                if p.inverse:
                    ctes.append(
                        f"""{eid} AS MATERIALIZED (
  SELECT obj AS focus, subj AS val, TRUE AS val_is_iri,
         CAST(NULL AS VARCHAR) AS val_lang, CAST(NULL AS VARCHAR) AS val_dtype
  FROM t WHERE module = {m} AND pred = {_q(p.path)}
    AND obj IN (SELECT focus FROM {fid})
)""")
                else:
                    ctes.append(
                        f"""{eid} AS MATERIALIZED (
  SELECT subj AS focus, obj AS val, obj_is_iri AS val_is_iri,
         lang AS val_lang, dtype AS val_dtype
  FROM t WHERE module = {m} AND pred = {_q(p.path)}
    AND subj IN (SELECT focus FROM {fid})
)""")
                cname = _cname(p)

                def emit(constraint: str, focus_query: str) -> None:
                    selects.append(
                        f"SELECT {m} AS module, {sh} AS shape, "
                        f"{_q(constraint)} AS \"constraint\", "
                        f"COUNT(DISTINCT focus) AS n_violations\n"
                        f"FROM ({focus_query}) v\n"
                        f"HAVING COUNT(DISTINCT focus) > 0")

                if p.min_count > 0 or p.max_count is not None:
                    withc = (
                        f"SELECT f.focus, COALESCE(c.n, 0) AS n FROM {fid} f "
                        f"LEFT JOIN (SELECT focus, COUNT(*) AS n FROM {eid} "
                        f"GROUP BY focus) c ON f.focus = c.focus")
                    if p.min_count > 0:
                        emit(f"{cname}.minCount{p.min_count}",
                             f"SELECT focus FROM ({withc}) w WHERE n < {p.min_count}")
                    if p.max_count is not None:
                        emit(f"{cname}.maxCount{p.max_count}",
                             f"SELECT focus FROM ({withc}) w WHERE n > {p.max_count}")
                if p.node_kind == "IRI":
                    emit(f"{cname}.nodeKindIRI",
                         f"SELECT focus FROM {eid} WHERE NOT val_is_iri")
                elif p.node_kind == "Literal":
                    emit(f"{cname}.nodeKindLiteral",
                         f"SELECT focus FROM {eid} WHERE val_is_iri")
                if p.datatype is not None:
                    emit(f"{cname}.datatype",
                         f"SELECT focus FROM {eid} WHERE val_is_iri "
                         f"OR val_dtype IS NULL OR val_dtype <> {_q(p.datatype)}")
                if p.language_in is not None:
                    langs = ", ".join(_q(x) for x in p.language_in)
                    emit(f"{cname}.languageIn",
                         f"SELECT focus FROM {eid} WHERE val_is_iri "
                         f"OR val_lang IS NULL OR val_lang NOT IN ({langs})")
                if p.pattern is not None:
                    emit(f"{cname}.pattern",
                         f"SELECT focus FROM {eid} WHERE val_is_iri "
                         f"OR NOT regexp_matches(val, {_q(p.pattern)})")
                if p.starts_with is not None:
                    emit(f"{cname}.startsWith",
                         f"SELECT focus FROM {eid} "
                         f"WHERE NOT starts_with(val, {_q(p.starts_with)})")
                if p.has_value is not None:
                    emit(f"{cname}.hasValue",
                         f"SELECT focus FROM {fid} WHERE focus NOT IN "
                         f"(SELECT focus FROM {eid} WHERE val_is_iri "
                         f"AND val = {_q(p.has_value)})")
                if p.has_literal is not None:
                    v, lg = p.has_literal
                    lang_cond = ("val_lang IS NULL" if lg is None
                                 else f"val_lang = {_q(lg)}")
                    emit(f"{cname}.hasLiteral",
                         f"SELECT focus FROM {fid} WHERE focus NOT IN "
                         f"(SELECT focus FROM {eid} WHERE NOT val_is_iri "
                         f"AND val = {_q(v)} AND {lang_cond})")
                if p.cls_any is not None:
                    clss = ", ".join(_q(c) for c in p.cls_any)
                    emit(f"{cname}.class",
                         f"SELECT focus FROM {eid} WHERE (NOT val_is_iri) "
                         f"OR val NOT IN (SELECT focus FROM typed "
                         f"WHERE module = {m} AND cls IN ({clss}))")
                if p.node is not None:
                    ref = by_name[p.node]
                    emit(f"{cname}.node({p.node})",
                         f"SELECT focus FROM {eid} WHERE (NOT val_is_iri) "
                         f"OR val NOT IN ({member_sql(ref)})")

    body = "\nUNION ALL\n".join(selects)
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT * FROM (\n{body}\n) allv "
              "ORDER BY module, shape, \"constraint\"")
