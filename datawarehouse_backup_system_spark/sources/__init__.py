"""Sources: file discovery/routing, sniffing CSV reader, zip pre-staging."""
