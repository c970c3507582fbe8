"""Enterprise extensions: external-source connectors (reference ee/)."""
