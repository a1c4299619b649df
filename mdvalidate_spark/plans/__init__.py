"""Run planning: the partition manifest (resume checkpoint) and run lifecycle."""
