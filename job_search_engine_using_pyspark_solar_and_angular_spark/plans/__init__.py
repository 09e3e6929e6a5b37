"""Plans: end-to-end pipelines composed from the operator modules (the
reference's batch preprocessing job and its streaming equivalent)."""
