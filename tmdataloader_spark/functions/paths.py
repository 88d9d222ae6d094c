r"""Path functions over i2b2 materialized-path strings (``\A\B\C\``).

Reference parity (SURVEY.md §2.8):
- X1 parse_nth_value      — sql/oracle/procedures/parse_nth_value.sql:4-29
- X3 get/replace last component — sql/postgres/procedures/GET_LAST_PATH_COMPONENT.sql,
  REPLACE_LAST_PATH_COMPONENT.sql
- X6 I2B2_GET_HLEVEL / I2B2_GET_NODE_NAME — sql/postgres/procedures/I2B2_GET_HLEVEL.sql
- X12 escape-for-LIKE — sql/postgres/procedures/I2B2_FILL_IN_TREE.sql:52

Paths are kept as the canonical ``\``-delimited string for warehouse
fidelity; helpers also expose the ``ArrayType(StringType)`` component
view, which is the scale-friendly representation (ancestor expansion
becomes ``posexplode`` — no LIKE theta-joins, SURVEY.md §2.9 T2).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# A backslash as seen by Java regex: the Python string '\\\\' is the
# 2-char regex '\\', i.e. one literal backslash.
BSLASH_RE = "\\\\"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def path_components(path: Column | str) -> Column:
    r"""Split ``\A\B\C\`` into array ['A','B','C'] (empty edges removed)."""
    return F.filter(F.split(_c(path), BSLASH_RE), lambda x: x != "")


def parse_nth_value(path: Column | str, n: Column | int, delim: str = "\\") -> Column:
    """n-th delimited component, 1-based, like the reference's
    ``parse_nth_value`` (oracle/procedures/parse_nth_value.sql:4-29).

    The reference counts raw split positions (delimiter-bounded), so a
    leading delimiter yields an empty first token; we match that: n is
    an index into the raw split, 1-based.
    """
    delim_re = "".join("\\" + ch if not ch.isalnum() else ch for ch in delim)
    arr = F.split(_c(path), delim_re)
    nn = F.lit(n) if isinstance(n, int) else n
    return F.try_element_at(arr, nn)


def get_last_path_component(path: Column | str) -> Column:
    """Last non-empty component (GET_LAST_PATH_COMPONENT.sql)."""
    return F.try_element_at(path_components(path), F.lit(-1))


def replace_last_path_component(path: Column | str, new_name: Column | str) -> Column:
    """Swap the final component, keeping the trailing backslash
    (REPLACE_LAST_PATH_COMPONENT.sql)."""
    new = _c(new_name) if isinstance(new_name, Column) else F.lit(new_name)
    stripped = F.regexp_replace(_c(path), BSLASH_RE + "[^" + BSLASH_RE + "]+" + BSLASH_RE + "$", "")
    return F.concat(stripped, F.lit("\\"), new, F.lit("\\"))


def path_hlevel(path: Column | str, root_level: int = 0) -> Column:
    r"""Depth of the node: number of components - 1 + root_level
    (I2B2_GET_HLEVEL.sql: count of ``\`` minus 2 plus root level)."""
    return F.size(path_components(path)) - 1 + root_level


def path_prefixes_expr(path: Column | str) -> Column:
    r"""All ancestor-or-self prefix paths of ``\A\B\C\`` as an array
    ``['\A\', '\A\B\', '\A\B\C\']``.

    This is the engine's replacement for the reference's transitive
    closure (I2B2_CREATE_FULL_TREE.sql:18-89, the 5-bucket LIKE
    self-join): exploding this array and equi-joining on the prefix is
    O(n·depth) and shuffle-friendly at 100 TB, where a LIKE theta-join
    is O(n²).
    """
    comps = path_components(path)
    idx = F.sequence(F.lit(1), F.size(comps))
    return F.transform(
        idx,
        lambda i: F.concat(
            F.lit("\\"), F.array_join(F.slice(comps, 1, i), "\\"), F.lit("\\")
        ),
    )


def escape_like(col: Column | str) -> Column:
    r"""Escape LIKE metachars ``* % _`` with ``*`` prefix, matching
    I2B2_FILL_IN_TREE.sql:52 (``([*%_])`` → ``*\1``). Mostly obsolete
    under the equi-join rewrite but kept for parity."""
    return F.regexp_replace(_c(col), r"([*%_])", r"*$1")
