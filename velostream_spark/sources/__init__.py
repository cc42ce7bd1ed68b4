"""Sources & sinks (reference src/velostream/datasource/*).

- ``files``: batch file readers/writers for the reference's formats
  (csv, csv_no_header, jsonl, json-array — file/config.rs:8-18); streaming
  variants live in velostream_spark.streaming.source.
- ``kafka``: Kafka reader/writer builders mapping the reference's consumer/
  producer configs (kafka/data_source.rs, data_sink.rs) onto Spark's Kafka
  connector options, including headers and PRIMARY-KEY-derived message keys.
"""
