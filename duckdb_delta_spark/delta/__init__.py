"""Delta Lake protocol machinery (log, snapshot, scan, write, catalog)."""
