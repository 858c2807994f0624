#!/usr/bin/env python3
"""Measure post-collapse (keeper) LSH bucket populations at a given SF.

Informs the hot-bucket caps for the banded LSH families: the cap must sit
above every graded-corpus bucket so the capped queries stay hash-identical
to the uncapped semantics at graded scale, while bounding adversarial
(dup-heavy) corpora. Driver-side tooling only (duckdb), like check.py.
"""
import sys
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")

SH = """
WITH sh AS (
  SELECT doc_id, source,
    list_distinct(CASE WHEN len(w) >= 3
      THEN list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
      ELSE []::VARCHAR[] END) AS sh
  FROM (SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS w FROM documents))
"""

def mh(j):
    return ("CAST(list_aggregate(list_transform(sh, x -> ('0x' || "
            f"substr(md5(x || '|{j}'), 1, 8))::UBIGINT), 'min') AS BIGINT)")

# MinHash: keepers = distinct 4-tuple signatures; buckets = band values
q_minhash = SH + f"""
, sig AS (SELECT doc_id, {mh(0)} AS mh0, {mh(1)} AS mh1,
    {mh(2)} AS mh2, {mh(3)} AS mh3 FROM sh WHERE len(sh) > 0)
, keep AS (SELECT DISTINCT mh0, mh1, mh2, mh3 FROM sig)
, b0 AS (SELECT count(*) AS pop FROM keep GROUP BY mh0, mh1)
, b1 AS (SELECT count(*) AS pop FROM keep GROUP BY mh2, mh3)
SELECT (SELECT count(*) FROM sig) AS docs, (SELECT count(*) FROM keep) AS keepers,
  (SELECT max(pop) FROM b0) AS max_b0, (SELECT max(pop) FROM b1) AS max_b1
"""

# SimHash 60-bit: band = fp >> 44
w60 = ",\n      ".join(
    f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS w{b}"
    for b in range(60))
a60 = " + ".join(f"CASE WHEN w{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(60))
q_simhash = f"""
WITH fp AS (
  SELECT doc_id, CAST({a60} AS BIGINT) AS fp FROM (
    SELECT doc_id, {w60}
    FROM (SELECT doc_id, CAST(('0x' || substr(md5(w), 1, 15))::UBIGINT AS BIGINT) AS h
          FROM (SELECT doc_id, unnest(list_distinct(string_split_regex(trim(text), '\\s+'))) AS w
                FROM documents)) GROUP BY doc_id)),
keep AS (SELECT DISTINCT fp FROM fp),
b AS (SELECT count(*) AS pop FROM keep GROUP BY fp >> 44)
SELECT (SELECT count(*) FROM fp) AS docs, (SELECT count(*) FROM keep) AS keepers,
  (SELECT max(pop) FROM b) AS max_band
"""

# Media: 48-bit window-sketch sig, 4 x 12-bit bands
w48 = ",\n  ".join(
    f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS w{b}"
    for b in range(48))
a48 = " + ".join(f"CASE WHEN w{b} > 0 THEN {1 << b}::BIGINT ELSE 0 END"
                 for b in range(48))
bands = "\nUNION ALL\n".join(
    f"SELECT count(*) AS pop FROM keep GROUP BY (sig >> {b * 12}) & 4095"
    for b in range(4))
q_media = f"""
WITH pay AS (SELECT doc_id, hex(encode(text)) AS h,
    octet_length(encode(text)) AS len
  FROM documents WHERE octet_length(encode(text)) >= 4),
win AS (SELECT DISTINCT doc_id, substr(h, 2*i - 1, 8) AS w
  FROM (SELECT doc_id, h, unnest(range(1, len - 2)) AS i FROM pay)),
hs AS (SELECT doc_id, ('0x' || substr(md5(w), 1, 12))::UBIGINT AS h FROM win),
sigw AS (SELECT doc_id, {w48} FROM hs GROUP BY doc_id),
sig0 AS (SELECT doc_id, CAST({a48} AS BIGINT) AS sig FROM sigw),
keep AS (SELECT DISTINCT sig FROM sig0),
b AS ({bands})
SELECT (SELECT count(*) FROM sig0) AS docs, (SELECT count(*) FROM keep) AS keepers,
  (SELECT max(pop) FROM b) AS max_band
"""

for name, q in [("minhash", q_minhash), ("simhash", q_simhash), ("media", q_media)]:
    row = con.execute(q).fetchone()
    print(name, dict(zip([d[0] for d in con.description], row)))
