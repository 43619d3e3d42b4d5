"""Source/sink adapters: hOCR page parsing, ALTO export, txt/CSV writers
(SURVEY.md §2.1 scans + §2.9 exports)."""
