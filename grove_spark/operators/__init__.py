from grove_spark.operators.processors import (  # noqa: F401
    extract_paths,
    filter_entries,
    filter_paths,
    split_path,
    zip_paths,
    apply_chain,
)
