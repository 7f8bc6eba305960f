"""Ray Data pipeline wiring: encode / decode / verify / repartition."""
