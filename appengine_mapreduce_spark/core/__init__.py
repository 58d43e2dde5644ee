"""Core engine layer: the MapReduceJob-shaped API compiled to DataFrame
plans, plus shared scale utilities (partitioning, counters)."""
