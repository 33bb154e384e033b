"""End-to-end pipeline plans (the reference's run_detection analog)."""
