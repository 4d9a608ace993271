"""svglib subpackage."""
