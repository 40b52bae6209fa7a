"""Scan-time transform operators (SURVEY.md §2.3-§2.6), expressed as
Catalyst-friendly DataFrame transforms over the `readstat` source."""
