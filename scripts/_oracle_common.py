"""Shared pieces of the oracle checkers (check_entry / check_all) —
one copy of the table list, view registration, and row-set
canonicalization so the one-entry triage tool and the all-entries
receipt can never silently diverge."""

from __future__ import annotations

import os

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def register_views(con, sf_dir: str) -> None:
    """CREATE VIEW per fixture table that exists under ``sf_dir``."""
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")


def canon(df):
    """NaN-safe canonical row set: NaN->None, floats rounded to 6dp,
    repr-sorted (None-safe ordering).

    Limitation, shared with the driver's gate being approximated: the
    compare is dtype-blind (python ``5 == 5.0``), so an int-vs-float
    divergence between engines is surfaced by :func:`dtype_kinds`
    as a warning, not by this value compare.
    """

    def norm(v):
        if isinstance(v, float):
            return None if v != v else round(v, 6)
        return v

    return sorted(
        (tuple(norm(v) for v in row)
         for row in df.itertuples(index=False, name=None)),
        key=repr,
    )


def dtype_kinds(df) -> dict[str, str]:
    """Column -> numpy dtype.kind ('i' int, 'f' float, 'O' object...)
    — informational: an i-vs-f split between the Spark result and the
    oracle usually means a missing ::BIGINT cast that the driver's
    stricter schema gate may flag even when values compare equal.
    (Nullable ints arrive as 'f' after pandas promotion, so kind
    mismatches are a WARNING, not a failure.)"""
    return {c: df[c].dtype.kind for c in df.columns}
