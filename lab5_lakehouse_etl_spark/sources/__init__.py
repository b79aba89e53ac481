"""Sources & sinks: CSV/XLSX/JSON/text readers and writers + archival
(SURVEY §2.1, local-FS re-expression of the reference's S3 layout)."""
