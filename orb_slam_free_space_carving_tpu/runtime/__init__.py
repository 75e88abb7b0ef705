"""Host-side runtime: native bookkeeping + asynchronous stage pipeline."""
