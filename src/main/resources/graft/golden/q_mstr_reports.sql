SELECT report_id, name, file_path, json_md5 FROM (VALUES
  ('A1A1A1A1A1A1A1A1A1A1A1A1A1A1A1A1', 'Relatório de Vendas', 'Documento_1.html#A1A1A1A1A1A1A1A1A1A1A1A1A1A1A1A1', '9e84b4aadcdd0102a102ae9458cbdd17'),
  ('B2B2B2B2B2B2B2B2B2B2B2B2B2B2B2B2', 'Relatório Vazio', 'Documento_1.html#B2B2B2B2B2B2B2B2B2B2B2B2B2B2B2B2', 'b1c4e0949028bc321256d973300185bb')
) AS golden(report_id, name, file_path, json_md5)
