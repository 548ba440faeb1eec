"""Analytics corpus: windows, rollup, set ops, events (filled in incrementally)."""
