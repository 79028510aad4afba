"""placeholder — populated in this round."""
