"""README-as-tests (the reference's test_readme.py strategy,
SURVEY.md §5): every fenced python block in README.md must actually run
against the driver fixtures — the README is a contract, not decoration."""

import re
from pathlib import Path

SF = "/root/testdata/sf0.001"
README = (Path(__file__).parent.parent / "README.md").read_text()
BLOCKS = re.findall(r"```python\n(.*?)```", README, re.S)


def test_readme_has_expected_examples():
    assert len(BLOCKS) >= 2


def test_readme_block_stream_facade(spark):
    # first block: Stream facade with errors-as-data; 'events.parquet' is
    # illustrative — point it at a real fixture table
    code = BLOCKS[0].replace('"events.parquet"', f'"{SF}/events.parquet"')
    ns = {}
    exec(compile(code, "README.md[0]", "exec"), ns)
    out = ns["out"]
    # single-column streams collect as plain Python values (reference
    # element semantics): every odd value was caught and replaced by -1
    assert isinstance(out, list) and len(out) > 0
    assert all(v == -1 or v is None or v % 2 == 0 for v in out)
    assert -1 in out


def test_readme_block_dedup_pipeline(spark):
    code = BLOCKS[1]
    ns = {"sf_dir": SF}
    exec(compile(code, "README.md[1]", "exec"), ns)
    clean = ns["clean"]
    docs = ns["docs"]
    # dedup keeps cluster representatives: non-empty, no more than the corpus
    assert 0 < clean.count() <= docs.count()


def test_readme_block_sketch_profiling(spark):
    code = BLOCKS[2]
    ns = {"sf_dir": SF, "load_table": None}
    from kioss_spark.sources import load_table

    ns["load_table"] = load_table
    ns["spark"] = spark
    exec(compile(code, "README.md[2]", "exec"), ns)
    prof = {r["lang"]: r for r in ns["length_profile"].collect()}
    assert prof and all(
        r["q_50"] <= r["q_90"] <= r["q_99"] for r in prof.values()
    )
    ov = ns["overlap"].collect()
    assert ov and all(r["n_intersect"] <= r["n_union"] for r in ov)


def test_readme_block_audit_graph(spark):
    # fourth python block: contamination reach + pagerank + span dedup
    code = BLOCKS[3]
    ns = {"sf_dir": SF, "spark": spark}
    # reuse load_table from the pipeline block's import
    exec(compile("from kioss_spark.sources import load_table\n" + code,
                 "README.md[3]", "exec"), ns)
    blast = ns["blast_radius"]
    authority = ns["authority"]
    spans = ns["spans"]
    assert set(blast.columns) == {"doc_id", "hop"}
    assert set(authority.columns) == {"id", "deg", "rank_e9"}
    rows = spans.limit(5).collect()
    assert all(r["dup_cov_e6"] >= 0 for r in rows)
