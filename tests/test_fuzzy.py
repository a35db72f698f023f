"""FastSS ed<=1 join: completeness vs brute force on adversarial cases."""

from pyspark.sql import functions as F

from kioss_spark.operators.fuzzy import ed1_neighborhood, ed1_pairs


def test_neighborhood_contents(spark):
    row = spark.range(1).select(
        ed1_neighborhood(F.lit("abc")).alias("n")
    ).collect()[0]
    assert set(row["n"]) == {"abc", "bc", "ac", "ab"}


def test_ed1_pairs_complete_vs_brute(spark):
    # covers substitution (cat/cut), deletion/insertion (cat/cart), equal-
    # length shifts that are NOT ed1 (abcd/bcda), and repeated chars (aaa/aa)
    names = ["cat", "cut", "cart", "dog", "abcd", "bcda", "aaa", "aa", ""]
    df = spark.createDataFrame([(n,) for n in names], ["p"])
    got = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in ed1_pairs(df, col="p").collect()
    }
    import itertools

    def lev(a, b):
        d = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, d[0] = d[0], i
            for j, cb in enumerate(b, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (ca != cb))
        return d[len(b)]

    want = {
        (a, b, lev(a, b))
        for a, b in itertools.combinations(sorted(set(names)), 2)
        if lev(a, b) <= 1
    }
    assert got == want
