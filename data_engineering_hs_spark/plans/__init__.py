"""Plan-level orchestration: model DAG runner, incremental loads."""
