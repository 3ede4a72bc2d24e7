"""Engine operators: flagship standings, core relational, extended ops."""
