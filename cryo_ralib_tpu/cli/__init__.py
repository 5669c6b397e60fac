"""Command-line front-ends mirroring the reference's test_*.py CLIs."""
