"""Native (C++) host-runtime components: scene rasterization and IO."""
