"""conversation_with_vector_db_spark — a PySpark-native analytics engine.

A brand-new engine re-expressing, Spark-first, the query and
data-processing capabilities of the reference application
``RedoneRony/conversation-with-vector-db`` (a Node.js RAG/chat backend
over MongoDB + Pinecone + Redis + Postgres; see SURVEY.md):

* document -> chunk -> embed -> vector-index ingestion (batch),
* top-k vector similarity search + context assembly (the RAG read path),
* a relational query surface (filters, projections, joins, group-bys,
  sorts, pagination, set ops, maintenance rewrites),
* usage/cost analytics,
* streaming / incremental semantics (session TTL, running accumulation),
* a governed UDF/SQL entry point,

plus the large-scale training-data-pipeline operators a 100 TB corpus
needs: deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding near-dup), approximate similarity search, multimodal column
plumbing, and text analysis (language id, quality, tokens, fingerprints).

Everything is declarative DataFrame / Spark SQL so Catalyst + AQE pick
physical plans; Python UDFs appear only where built-ins genuinely cannot
express the semantics (and then as Arrow-vectorized pandas UDFs).
"""

__version__ = "0.1.0"
