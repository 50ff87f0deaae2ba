"""Sources/sinks: driver-table registration, Iceberg-shaped table IO."""
