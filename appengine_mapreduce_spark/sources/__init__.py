"""Input sources — the reference's InputReader zoo as DataFrame builders.

Partition planning (the reference's ``split_input``) is owned by Spark's
DataSource machinery; these helpers express the *semantics* (filters,
projections, line splitting, archives, generators) declaratively so
Catalyst plans the physical scan.
"""
