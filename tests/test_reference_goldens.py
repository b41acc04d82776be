"""Reference-parity golden tests.

B5: the star_wars DuckDB lab — exact literal fixture rows from
start_wars/main.ipynb:48-90 and the notebook's captured outputs as
goldens, re-run through Spark SQL.

B4: the lab03 badge investigation — the 4-stage staged-temp-table SQL
pipeline (script1.sql) over a synthetic fixture, including the
md5(lower(trim(name))) proof-checksum mechanic.
"""

from __future__ import annotations

import hashlib

import pytest

CHARACTERS = [
    ("Luke Skywalker", "Jedi", "Human", "Tatooine", 15000),
    ("Leia Organa", "Rebel", "Human", "Alderaan", 4000),
    ("Han Solo", "Rebel", "Human", "Corellia", 3000),
    ("Darth Vader", "Sith", "Human", "Tatooine", 20000),
    ("Yoda", "Jedi", "Unknown", "Dagobah", 17500),
    ("Obi-Wan Kenobi", "Jedi", "Human", "Stewjon", 16000),
    ("Emperor Palpatine", "Sith", "Human", "Naboo", 19000),
]
PLANETS = [
    ("Tatooine", "desert", "Outer Rim"),
    ("Alderaan", "temperate", "Core"),
    ("Corellia", "temperate", "Core"),
    ("Dagobah", "swamp", "Outer Rim"),
    ("Stewjon", "temperate", "Unknown"),
    ("Naboo", "temperate", "Mid Rim"),
    ("Coruscant", "urban", "Core"),
]


@pytest.fixture()
def star_wars(spark):
    spark.createDataFrame(
        CHARACTERS, ["name", "affiliation", "species", "homeworld", "midichlorians"]
    ).createOrReplaceTempView("characters")
    spark.createDataFrame(
        PLANETS, ["name", "climate", "region"]
    ).createOrReplaceTempView("planets")
    return spark


class TestStarWarsGoldens:
    """Each expected tuple list is the notebook's captured output."""

    def test_jedi_sorted(self, star_wars):
        got = [
            tuple(r)
            for r in star_wars.sql(
                "SELECT name, homeworld, midichlorians FROM characters "
                "WHERE affiliation = 'Jedi' ORDER BY midichlorians DESC"
            ).collect()
        ]
        assert got == [
            ("Yoda", "Dagobah", 17500),
            ("Obi-Wan Kenobi", "Stewjon", 16000),
            ("Luke Skywalker", "Tatooine", 15000),
        ]

    def test_ilike_search(self, star_wars):
        got = [
            tuple(r)
            for r in star_wars.sql(
                "SELECT name, affiliation FROM characters WHERE name ILIKE '%sky%'"
            ).collect()
        ]
        assert got == [("Luke Skywalker", "Jedi")]

    def test_count_by_affiliation(self, star_wars):
        got = [
            tuple(r)
            for r in star_wars.sql(
                "SELECT affiliation, COUNT(*) AS n FROM characters "
                "GROUP BY affiliation ORDER BY n DESC, affiliation"
            ).collect()
        ]
        assert got == [("Jedi", 3), ("Rebel", 2), ("Sith", 2)]

    def test_avg_midichlorians_rounds_like_duckdb(self, star_wars):
        # DuckDB's ::INTEGER cast rounds half-up (Jedi avg 16166.67 →
        # 16167); Spark's int cast truncates, so the engine's parity
        # mapping is round() before cast (SURVEY §2.4 A2).
        got = [
            tuple(r)
            for r in star_wars.sql(
                "SELECT affiliation, CAST(round(AVG(midichlorians)) AS INT) "
                "AS avg_m FROM characters GROUP BY affiliation ORDER BY avg_m DESC"
            ).collect()
        ]
        assert got == [("Sith", 19500), ("Jedi", 16167), ("Rebel", 3500)]

    def test_left_join_keeps_unmatched(self, star_wars):
        got = [
            tuple(r)
            for r in star_wars.sql(
                "SELECT c.name, c.affiliation, c.homeworld, p.climate, p.region "
                "FROM characters c LEFT JOIN planets p ON c.homeworld = p.name "
                "ORDER BY c.name"
            ).collect()
        ]
        assert got[0] == ("Darth Vader", "Sith", "Tatooine", "desert", "Outer Rim")
        assert len(got) == 7

    def test_join_group_by_climate(self, star_wars):
        got = [
            tuple(r)
            for r in star_wars.sql(
                "SELECT p.climate, COUNT(*) AS n_chars FROM characters c "
                "JOIN planets p ON c.homeworld = p.name "
                "GROUP BY p.climate ORDER BY n_chars DESC"
            ).collect()
        ]
        assert got == [("temperate", 4), ("desert", 2), ("swamp", 1)]

    def test_parquet_export_and_direct_query(self, star_wars, tmp_path):
        # S11: COPY (SELECT ...) TO parquet; SELECT * FROM 'file'.
        out = str(tmp_path / "jedi.parquet")
        star_wars.sql(
            "SELECT name, homeworld, midichlorians FROM characters "
            "WHERE affiliation = 'Jedi'"
        ).write.parquet(out)
        got = [
            tuple(r)
            for r in star_wars.sql(
                f"SELECT * FROM parquet.`{out}` ORDER BY midichlorians DESC"
            ).collect()
        ]
        assert got == [
            ("Yoda", "Dagobah", 17500),
            ("Obi-Wan Kenobi", "Stewjon", 16000),
            ("Luke Skywalker", "Tatooine", 15000),
        ]


class TestBadgeInvestigation:
    """lab03 script1.sql: 4 staged temp tables → md5 proof (B4)."""

    @pytest.fixture()
    def tables(self, spark):
        spark.createDataFrame(
            [
                ("S1", "Opening Keynote"),
                ("S3", "The GOLDEN WALRUS Mystery Hour"),
                ("S4", "golden walrus encore"),
            ],
            ["session_code", "session_name"],
        ).createOrReplaceTempView("sessions")
        swipes = [
            ("BDG-1", "S3", "2025-09-01 13:05:00"),
            ("BDG-2", "S3", "2025-09-01 13:10:00"),
            ("BDG-2", "S3", "2025-09-01 13:12:00"),  # dup swipe → DISTINCT
            ("BDG-3", "S3", "2025-09-01 13:20:00"),  # outside 13:00-13:15
            ("BDG-4", "S1", "2025-09-01 13:05:00"),  # wrong session
            ("BDG-5", "S3", "2025-09-02 13:05:00"),  # wrong day
        ]
        spark.createDataFrame(
            swipes, ["badge_uid", "session_code", "ts_str"]
        ).selectExpr(
            "badge_uid", "session_code", "cast(ts_str as timestamp) as ts"
        ).createOrReplaceTempView("swipes")
        purchases = [
            ("BDG-1", "2025-09-01 15:10:00", "Coffee", "Cafeteria"),
            ("BDG-1", "2025-09-01 15:30:00", "Espresso", "Cafeteria"),
            ("BDG-1", "2025-09-01 16:00:00", "Coffee", "Cafeteria"),
            ("BDG-2", "2025-09-01 15:44:00", "Tea", "Cafeteria"),
            ("BDG-1", "2025-09-01 14:00:00", "Coffee", "Cafeteria"),  # pre-15:00
            ("BDG-1", "2025-09-01 15:50:00", "Coffee", "Gift Shop"),  # wrong loc
        ]
        spark.createDataFrame(
            purchases, ["badge_uid", "ts_str", "product", "location"]
        ).selectExpr(
            "badge_uid", "cast(ts_str as timestamp) as ts", "product", "location"
        ).createOrReplaceTempView("purchases")
        spark.createDataFrame(
            [("BDG-1", "  Ada LOVELACE "), ("BDG-2", "Grace Hopper")],
            ["badge_uid", "full_name"],
        ).createOrReplaceTempView("people")
        return spark

    def test_four_stage_pipeline(self, tables):
        spark = tables
        # Stage 1: ILIKE session lookup (script1.sql:4-8).
        code = spark.sql(
            "SELECT session_code FROM sessions "
            "WHERE session_name ILIKE '%GOLDEN WALRUS%' LIMIT 1"
        ).collect()[0][0]
        assert code == "S3"
        # Stage 2: distinct badges in the 13:00-13:15 window (:11-18).
        spark.sql(
            f"""
            CREATE OR REPLACE TEMP VIEW badges AS
            SELECT DISTINCT badge_uid FROM swipes
            WHERE session_code = '{code}'
              AND to_date(ts) = DATE '2025-09-01'
              AND date_format(ts, 'HH:mm') >= '13:00'
              AND date_format(ts, 'HH:mm') < '13:15'
            """
        )
        badges = sorted(r[0] for r in spark.table("badges").collect())
        assert badges == ["BDG-1", "BDG-2"]
        # Stage 3: cafeteria purchases after 15:00 with is_coffee (:30-42).
        spark.sql(
            """
            CREATE OR REPLACE TEMP VIEW cafe AS
            SELECT p.badge_uid, p.ts, p.product,
                   (p.product ILIKE '%coffee%' OR p.product ILIKE '%espresso%')
                     AS is_coffee
            FROM purchases p JOIN badges USING (badge_uid)
            WHERE to_date(p.ts) = DATE '2025-09-01'
              AND date_format(p.ts, 'HH:mm') >= '15:00'
              AND p.location ILIKE 'cafeteria'
            """
        )
        # Stage 4: HAVING >= 3 coffee purchases (:53-59) + md5 proof (:64-70).
        spark.sql(
            """
            CREATE OR REPLACE TEMP VIEW culprits AS
            SELECT badge_uid FROM cafe WHERE is_coffee
            GROUP BY badge_uid HAVING COUNT(*) >= 3
            """
        )
        assert [r[0] for r in spark.table("culprits").collect()] == ["BDG-1"]
        expected = hashlib.md5(b"ada lovelace").hexdigest()
        proof = spark.sql(
            f"""
            SELECT p.full_name, c.badge_uid,
                   md5(lower(trim(p.full_name))) AS proof_checksum
            FROM culprits c JOIN people p USING (badge_uid)
            WHERE md5(lower(trim(p.full_name))) = '{expected}'
            """
        ).collect()
        assert len(proof) == 1
        assert proof[0]["badge_uid"] == "BDG-1"
        assert proof[0]["proof_checksum"] == expected
