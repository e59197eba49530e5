"""Property test for the r8 oracle rewrite: the AllPairs/PPJoin
prefix-filter pair CTE (suite._jaccard_pair_ctes) must produce EXACTLY
the brute-force all-pairs exact-Jaccard pair set — the rewrite's whole
claim is that it is a faster formulation of the SAME oracle, so any
divergence (a pruned true pair) would silently weaken five driver
oracles (q37/q60/q64/q162/q176). Pure DuckDB over random corpora — no
Spark session."""

import random

import duckdb
import pytest

from polars_dataset_spark.suite import _jaccard_pair_ctes

_SHINGLE_SQL = r"""
d AS (
  SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm
  FROM documents),
tok AS (
  SELECT doc_id, CASE WHEN norm = '' THEN [''] ELSE string_split(norm, ' ') END AS toks
  FROM d),
sh AS (
  SELECT doc_id, CASE WHEN len(toks) >= 3
    THEN list_distinct(list_transform(range(1, len(toks) - 1),
                                      i -> array_to_string(toks[i:i+2], ' ')))
    ELSE [array_to_string(toks, ' ')] END AS shingles
  FROM tok)"""

_BRUTE = """
SELECT a.doc_id AS id_a, b.doc_id AS id_b
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE round(len(list_intersect(a.shingles, b.shingles))::DOUBLE
            / len(list_distinct(list_concat(a.shingles, b.shingles))), 6) >= {t}
ORDER BY 1, 2
"""


def _random_corpus(rng: random.Random, n_docs: int) -> "list[tuple[int, str]]":
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(n_docs):
        k = rng.randint(0, 12)
        base = " ".join(rng.choice(vocab) for _ in range(k))
        docs.append((i, base))
        # planted near-dups: copies with small edits (the pairs that must
        # survive), plus exact copies and empty docs
        if rng.random() < 0.4 and k >= 3:
            words = base.split(" ")
            j = rng.randrange(len(words))
            words[j] = rng.choice(vocab)
            docs.append((1000 + i, " ".join(words)))
        if rng.random() < 0.2:
            docs.append((2000 + i, base))
        if rng.random() < 0.1:
            docs.append((3000 + i, "   "))
    return docs


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("threshold", [0.5, 0.7, 0.9])
def test_prefix_filter_equals_brute_force(seed, threshold):
    rng = random.Random(seed)
    docs = _random_corpus(rng, 40)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    brute = con.sql(
        "WITH " + _SHINGLE_SQL + _BRUTE.format(t=threshold)
    ).fetchall()
    pref = con.sql(
        "WITH "
        + _SHINGLE_SQL
        + ","
        + _jaccard_pair_ctes(threshold)
        + "\nSELECT id_a, id_b FROM p ORDER BY 1, 2"
    ).fetchall()
    assert pref == brute
    # the corpora must actually exercise the filter: some seeds/thresholds
    # with zero pairs would vacuously pass — require pairs somewhere
    if threshold == 0.5 and seed == 0:
        assert brute, "fixture produced no pairs; corpus generator broken"
