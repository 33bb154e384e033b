"""Sources & sinks: checkpointed stage tables, fixture generation."""
