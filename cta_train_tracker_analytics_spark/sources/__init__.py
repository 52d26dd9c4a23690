"""Sources & sinks (SURVEY.md §2.1): JSONL read/write, fixture-backed REST
source, path-glob listing. The reference's literal dataflow
(``bucket_raw_data.py``, ``get_train_status.py``) re-expressed as Spark
readers/writers."""
