"""Model definitions: transformer decoder, vision towers, combined model."""
