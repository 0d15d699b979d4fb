from text2nkg_spark.sources.io import (  # noqa: F401
    read_table, write_table, read_reference_jsonl, write_facts_jsonl,
    load_label_space_json)
