"""Training-data pipeline functions (beyond-reference extensions).

The reference engine (doitintl/aws-dms-to-hudi) maintains keyed CDC lake
tables; a lake at 100 TB is usually *training-data* feedstock, so this
package adds the document/embedding operators such a pipeline needs:

- :mod:`.portable` — cross-engine (Spark SQL + DuckDB) expression
  generators; every operator here is oracle-checkable because both
  engines evaluate the *same* generated arithmetic.
- :mod:`.text`     — token counting, quality scoring, language ID,
  document fingerprinting.
- :mod:`.dedup`    — exact, n-gram Jaccard, MinHash+LSH, SimHash.
- :mod:`.similarity` — brute-force cosine top-k and LSH-bucketed ANN
  over ``array<float>`` embedding columns.
- :mod:`.multimodal` — opaque-binary column plumbing (decode stubs,
  Arrow-batched ``mapInPandas`` feature extraction).

These are extensions past the reference's own surface (SURVEY.md §7 M6);
nothing here maps to a reference file.
"""
