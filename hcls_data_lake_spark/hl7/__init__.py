"""HL7v2 ER7 handling: native expression splitter + Python parser UDF."""
