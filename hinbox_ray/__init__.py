"""hinbox_ray — a Ray-Data-native knowledge-graph construction engine.

Re-expresses the capabilities of the reference engine (strickvl/hinbox,
see SURVEY.md) as streaming ``ray.data.Dataset`` pipelines:

- ``sources``   : parquet readers + deterministic synthetic page generation
- ``functions`` : pure, vectorized kernels (html→text, name variants,
                  hashing, minhash/simhash, text stats)
- ``stages``    : ``map_batches`` stages (stateless tasks + actor pools)
- ``pipelines`` : end-to-end dataset pipelines (KG construction, dedup,
                  similarity search, relational queries, text analysis)
- ``state``     : per-partition lineage manifests for resumable runs

Nothing in this package calls ``ray.init()`` — sessions are owned by the
caller (bench.py / pytest fixture / the driver).
"""

__version__ = "0.1.0"
