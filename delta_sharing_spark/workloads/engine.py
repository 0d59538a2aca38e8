"""Engine-semantics workloads: snapshot, time travel, pruning, limit, CDF."""
