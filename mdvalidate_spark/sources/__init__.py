"""Input sources: deterministic synthetic fixtures (FIXTURES.md) and loaders
for the driver-generated parquet tables (TESTDATA.md)."""
