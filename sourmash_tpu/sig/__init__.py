"""'sourmash signature' subcommand implementations."""
