"""Training-data pipeline operators + operator-parity query registry."""
