"""Rule tables transcribed from the reference (pure data, no logic).

Sources (file:line in /root/reference):
- keyword lists / province & state maps / doc-number formats:
  app/services/document_type_detector.py:15-235
- DOCUMENT_PATTERNS + COUNTRY_CODES: app/models/document_types.py:65-377
- fake/specimen constants: app/services/fake_document_detector.py:24-120
- tolerant date-format list: app/services/validators/base.py:61-76

Python ``re`` patterns here are all simple anchored char-class forms,
verified Java-regex compatible (SURVEY.md §7.4.4).
"""

from __future__ import annotations

# ------------------------------------------------------------------ keywords
# document_type_detector.py:15-32
PASSPORT_KEYWORDS = [
    "passport", "passeport", "pasaporte", "reisepass", "паспорт",
    "passport no", "passport number",
]
DL_KEYWORDS = ["driver", "licence", "license", "permis", "conduire", "operator"]
HEALTH_CARD_KEYWORDS = [
    "health card", "health insurance", "ohip", "carte santé", "carte soleil",
]
PHOTO_ID_KEYWORDS = [
    "photo card", "photo id", "photocard", "photo identification",
    "identification card", "identity card", "id card", "bc services card",
    "bcid", "bc identification", "services card", "bc card", "enhanced id",
    "provincial id", "government id", "non-driver",
]
PR_CARD_KEYWORDS = [
    "permanent resident", "permanent residence", "résident permanent",
    "pr card", "carte rp", "carte de résident", "resident card",
    "immigration, refugees", "ircc", "immigration canada",
    "government of canada", "gouvernement du canada",
]

# ------------------------------------------------------------------ provinces
# document_type_detector.py:35-67 — insertion order matters (first match wins)
PROVINCE_MAPPING = {
    "ontario": "Ontario",
    "british columbia": "British Columbia",
    "alberta": "Alberta",
    "quebec": "Quebec",
    "québec": "quebec",  # normalized to "quebec" on match (detector :562-565)
    "manitoba": "Manitoba",
    "saskatchewan": "Saskatchewan",
    "nova scotia": "Nova Scotia",
    "new brunswick": "New Brunswick",
    "prince edward island": "Prince Edward Island",
    "newfoundland": "Newfoundland and Labrador",
    "northwest territories": "Northwest Territories",
    "nunavut": "Nunavut",
    "yukon": "Yukon",
}

PROVINCE_ABBREV = {
    " on ": "ontario", ", on": "ontario", "on,": "ontario", "ont": "ontario",
    " bc ": "british columbia", ", bc": "british columbia",
    "b.c.": "british columbia",
    " ab ": "alberta", ", ab": "alberta", "alta": "alberta",
    " qc ": "quebec", ", qc": "quebec", "(qc)": "quebec", "que": "quebec",
    "permis de conduire": "quebec",
    " mb ": "manitoba", ", mb": "manitoba",
    " sk ": "saskatchewan", ", sk": "saskatchewan", "sask": "saskatchewan",
    " ns ": "nova scotia", ", ns": "nova scotia",
    " nb ": "new brunswick", ", nb": "new brunswick",
    " pe ": "prince edward island", ", pe": "prince edward island",
    "pei": "prince edward island",
    " nl ": "newfoundland", ", nl": "newfoundland", "nfld": "newfoundland",
    " nt ": "northwest territories", ", nt": "northwest territories",
    "nwt": "northwest territories",
    " nu ": "nunavut", ", nu": "nunavut",
    " yt ": "yukon", ", yt": "yukon",
}

# DL_TYPES: province -> (doc_type, state_province, doc_name)
# document_type_detector.py:70-84
DL_TYPES = {
    "ontario": ("ontario_drivers_license", "Ontario", "Ontario Driver's License"),
    "british columbia": ("bc_drivers_license", "British Columbia", "BC Driver's Licence"),
    "alberta": ("alberta_drivers_license", "Alberta", "Alberta Driver's Licence"),
    "quebec": ("quebec_drivers_license", "Quebec", "Quebec Driver's Licence"),
    "manitoba": ("manitoba_drivers_license", "Manitoba", "Manitoba Driver's Licence"),
    "saskatchewan": ("saskatchewan_drivers_license", "Saskatchewan", "Saskatchewan Driver's Licence"),
    "nova scotia": ("nova_scotia_drivers_license", "Nova Scotia", "Nova Scotia Driver's Licence"),
    "new brunswick": ("new_brunswick_drivers_license", "New Brunswick", "New Brunswick Driver's Licence"),
    "prince edward island": ("pei_drivers_license", "Prince Edward Island", "PEI Driver's Licence"),
    "newfoundland": ("newfoundland_drivers_license", "Newfoundland and Labrador", "Newfoundland Driver's Licence"),
    "northwest territories": ("nwt_drivers_license", "Northwest Territories", "NWT Driver's Licence"),
    "nunavut": ("nunavut_drivers_license", "Nunavut", "Nunavut Driver's Licence"),
    "yukon": ("yukon_drivers_license", "Yukon", "Yukon Driver's Licence"),
}

PHOTO_ID_TYPES = {
    "ontario": ("ontario_photo_card", "Ontario", "Ontario Photo Card"),
    "british columbia": ("bc_photo_id", "British Columbia", "BC Photo ID"),
    "alberta": ("alberta_photo_id", "Alberta", "Alberta Photo ID"),
}

# ------------------------------------------------------------------ US states
US_STATE_MAPPING = {
    "california": "California", "texas": "Texas", "florida": "Florida",
    "new york": "New York", "illinois": "Illinois",
    "pennsylvania": "Pennsylvania", "ohio": "Ohio", "georgia": "Georgia",
    "michigan": "Michigan", "arizona": "Arizona", "washington": "Washington",
    "new jersey": "New Jersey", "nevada": "Nevada", "colorado": "Colorado",
    "oregon": "Oregon",
}

US_STATE_ABBREV = {
    " ca ": "california", ", ca": "california", "ca,": "california",
    " tx ": "texas", ", tx": "texas", "tx,": "texas",
    " fl ": "florida", ", fl": "florida", "fl,": "florida",
    " ny ": "new york", ", ny": "new york", "ny,": "new york",
    " il ": "illinois", ", il": "illinois", "il,": "illinois",
    " pa ": "pennsylvania", ", pa": "pennsylvania", "pa,": "pennsylvania",
    " oh ": "ohio", ", oh": "ohio", "oh,": "ohio",
    " ga ": "georgia", ", ga": "georgia", "ga,": "georgia",
    " mi ": "michigan", ", mi": "michigan", "mi,": "michigan",
    " az ": "arizona", ", az": "arizona", "az,": "arizona",
    " wa ": "washington", ", wa": "washington", "wa,": "washington",
    " nj ": "new jersey", ", nj": "new jersey", "nj,": "new jersey",
    " nv ": "nevada", ", nv": "nevada", "nv,": "nevada",
    " co ": "colorado", ", co": "colorado", "co,": "colorado",
    " or ": "oregon", ", or": "oregon", "or,": "oregon",
}

US_DL_TYPES = {
    "california": ("california_drivers_license", "California", "California Driver's License"),
    "texas": ("texas_drivers_license", "Texas", "Texas Driver's License"),
}

# --------------------------------------------------- doc-number format cascade
# document_type_detector.py:136-235 — ordered dict, first match wins, conf 0.7
DOC_NUMBER_FORMATS = [
    ("ontario_drivers_license", r"^[A-Z]\d{4}-?\d{5}-?\d{5}$", "Canada", "Ontario", "Ontario Driver's License"),
    ("bc_drivers_license", r"^(NDL:?|DL:?)?\d{6,7}$", "Canada", "British Columbia", "BC Driver's Licence"),
    ("alberta_drivers_license", r"^\d{6}-?\d{3}$", "Canada", "Alberta", "Alberta Driver's Licence"),
    ("quebec_drivers_license", r"^[A-Z]\d{4}-?\d{6}-?\d{2}$", "Canada", "Quebec", "Quebec Driver's Licence"),
    ("manitoba_drivers_license", r"^\d{9}$", "Canada", "Manitoba", "Manitoba Driver's Licence"),
    ("saskatchewan_drivers_license", r"^\d{8}$", "Canada", "Saskatchewan", "Saskatchewan Driver's Licence"),
    ("nova_scotia_drivers_license", r"^[A-Z]{5}\d{9}$", "Canada", "Nova Scotia", "Nova Scotia Driver's Licence"),
    ("new_brunswick_drivers_license", r"^\d{7}$", "Canada", "New Brunswick", "New Brunswick Driver's Licence"),
    ("newfoundland_drivers_license", r"^[A-Z]\d{9}$", "Canada", "Newfoundland and Labrador", "Newfoundland Driver's Licence"),
    ("ontario_health_card", r"^\d{10}[A-Z]{2}$", "Canada", "Ontario", "Ontario Health Card"),
    ("canadian_passport", r"^[A-Z]{2}\d{6}$", "Canada", None, "Canadian Passport"),
    ("canada_pr_card", r"^[A-Z]{2}\d{6}$", "Canada", None, "Canada Permanent Residence Card"),
    ("california_drivers_license", r"^[A-Z]\d{7}$", "United States", "California", "California Driver's License"),
    ("texas_drivers_license", r"^\d{8}$", "United States", "Texas", "Texas Driver's License"),
]

# --------------------------------------------------------- DOCUMENT_PATTERNS
# document_types.py:65-319. Fields: name, country, country_code,
# state_province, license_format, keywords. Insertion order preserved
# (passport country_code lookup iterates in order, detector :431-435).
DOCUMENT_PATTERNS = [
    ("ontario_drivers_license", "Ontario Driver's License", "Canada", None, "Ontario",
     r"^[A-Z]\d{4}-\d{5}-\d{5}$",
     ["ontario", "driver's licence", "driver licence", "class g", "class g1", "class g2"]),
    ("ontario_health_card", "Ontario Health Card", "Canada", None, "Ontario",
     r"^\d{10}[A-Z]{2}$",
     ["ontario", "health card", "ohip", "ministry of health", "carte santé"]),
    ("bc_drivers_license", "BC Driver's Licence", "Canada", None, "British Columbia",
     r"^(NDL:?|DL:?)?\d{6,7}$",
     ["british columbia", "bc", "driver's licence", "driver licence", "class 5", "class 7", "ndl"]),
    ("alberta_drivers_license", "Alberta Driver's Licence", "Canada", None, "Alberta",
     r"^\d{6}-?\d{3}$",
     ["alberta", "ab", "driver's licence", "driver licence", "class 5", "class 7", "gdl"]),
    ("quebec_drivers_license", "Quebec Driver's Licence", "Canada", None, "Quebec",
     r"^[A-Z]\d{4}-?\d{6}-?\d{2}$",
     ["quebec", "qc", "permis de conduire", "driver's licence", "classe 5", "probatoire"]),
    ("manitoba_drivers_license", "Manitoba Driver's Licence", "Canada", None, "Manitoba",
     r"^\d{9}$",
     ["manitoba", "mb", "driver's licence", "driver licence", "class 5", "dd/réf", "dd/ref"]),
    ("saskatchewan_drivers_license", "Saskatchewan Driver's Licence", "Canada", None, "Saskatchewan",
     r"^\d{8}$",
     ["saskatchewan", "sk", "sgi", "driver's licence", "driver licence", "class 5", "class 7"]),
    ("nova_scotia_drivers_license", "Nova Scotia Driver's Licence", "Canada", None, "Nova Scotia",
     r"^[A-Z]{5}\d{9}$",
     ["nova scotia", "ns", "driver's licence", "driver licence", "class 5", "class 7"]),
    ("new_brunswick_drivers_license", "New Brunswick Driver's Licence", "Canada", None, "New Brunswick",
     r"^\d{7}$",
     ["new brunswick", "nouveau-brunswick", "nb", "driver's licence", "permis de conduire", "class 5", "class 7"]),
    ("pei_drivers_license", "PEI Driver's Licence", "Canada", None, "Prince Edward Island",
     r"^\d{1,6}$",
     ["prince edward island", "pei", "pe", "driver's licence", "driver licence", "class 5", "class 7"]),
    ("newfoundland_drivers_license", "Newfoundland Driver's Licence", "Canada", None, "Newfoundland and Labrador",
     r"^[A-Z]\d{9}$",
     ["newfoundland", "labrador", "nl", "driver's licence", "driver licence", "class 5", "class 7"]),
    ("nwt_drivers_license", "NWT Driver's Licence", "Canada", None, "Northwest Territories",
     r"^\d{6}$",
     ["northwest territories", "nwt", "nt", "driver's licence", "driver licence", "class 5", "class 7"]),
    ("nunavut_drivers_license", "Nunavut Driver's Licence", "Canada", None, "Nunavut",
     r"^\d{6}$",
     ["nunavut", "nu", "driver's licence", "driver licence", "class 5", "class 7"]),
    ("yukon_drivers_license", "Yukon Driver's Licence", "Canada", None, "Yukon",
     r"^\d{6}$",
     ["yukon", "yt", "yk", "driver's licence", "driver licence", "class 5", "class 7"]),
    ("canadian_passport", "Canadian Passport", "Canada", "CAN", None,
     r"^[A-Z]{2}\d{6}$",
     ["canada", "canadian", "passport", "passeport", "CAN"]),
    ("us_passport", "US Passport", "United States", "USA", None,
     r"^\d{9}$",
     ["united states", "usa", "american", "passport", "USA"]),
    ("uk_passport", "UK Passport", "United Kingdom", "GBR", None,
     r"^\d{9}$",
     ["united kingdom", "british", "uk", "gbr", "passport", "GBR"]),
    ("india_passport", "India Passport", "India", "IND", None,
     r"^[A-Z]\d{7}$",
     ["india", "indian", "republic of india", "passport", "IND"]),
    ("australia_passport", "Australia Passport", "Australia", "AUS", None,
     r"^[A-Z]{1,2}\d{7}$",
     ["australia", "australian", "passport", "AUS"]),
    ("germany_passport", "Germany Passport", "Germany", "DEU", None,
     r"^[A-Z0-9]{9}$",
     ["germany", "german", "bundesrepublik", "deutschland", "passport", "reisepass", "DEU"]),
    ("france_passport", "France Passport", "France", "FRA", None,
     r"^[A-Z0-9]{9}$",
     ["france", "french", "république française", "passport", "passeport", "FRA"]),
    ("nigeria_passport", "Nigeria Passport", "Nigeria", "NGA", None,
     r"^[A-Z]\d{8}$",
     ["nigeria", "nigerian", "federal republic of nigeria", "passport", "NGA"]),
    ("china_passport", "China Passport", "China", "CHN", None,
     r"^[EGD]\d{8}$",
     ["china", "chinese", "people's republic of china", "中华人民共和国", "passport", "CHN"]),
    ("colombia_passport", "Colombia Passport", "Colombia", "COL", None,
     r"^[A-Z]{2}\d{7}$",
     ["colombia", "colombian", "república de colombia", "passport", "pasaporte", "COL"]),
    ("ukraine_passport", "Ukraine Passport", "Ukraine", "UKR", None,
     r"^[A-Z]{2}\d{6}$",
     ["ukraine", "ukrainian", "україна", "passport", "паспорт", "UKR"]),
    ("generic_passport", "International Passport", None, None, None,
     r"^[A-Z0-9]{6,12}$",
     ["passport", "passeport", "pasaporte", "reisepass", "паспорт"]),
    ("canada_pr_card", "Canada Permanent Residence Card", "Canada", "CAN", None,
     r"^[A-Z]{2}\d{6}$",
     ["permanent resident", "permanent residence", "résident permanent", "pr card", "immigration", "canada"]),
    ("california_drivers_license", "California Driver's License", "United States", None, "California",
     r"^[A-Z]\d{7}$",
     ["california", "ca", "driver license", "driver's license", "dmv", "state of california"]),
    ("texas_drivers_license", "Texas Driver's License", "United States", None, "Texas",
     r"^\d{8}$",
     ["texas", "tx", "driver license", "driver's license", "dps", "state of texas"]),
    ("us_drivers_license", "US Driver's License", "United States", None, None,
     r"^[A-Z0-9]{6,15}$",
     ["driver license", "driver's license", "dmv"]),
]

# ------------------------------------------------------------- country codes
# document_types.py:323-377 — full ISO 3166-1 alpha-3 table
COUNTRY_CODES = {
    "DZA": "Algeria", "AGO": "Angola", "BEN": "Benin", "BWA": "Botswana",
    "BFA": "Burkina Faso", "BDI": "Burundi", "CMR": "Cameroon",
    "CPV": "Cape Verde", "CAF": "Central African Republic", "TCD": "Chad",
    "COM": "Comoros", "COG": "Congo", "COD": "DR Congo", "CIV": "Ivory Coast",
    "DJI": "Djibouti", "EGY": "Egypt", "GNQ": "Equatorial Guinea",
    "ERI": "Eritrea", "SWZ": "Eswatini", "ETH": "Ethiopia", "GAB": "Gabon",
    "GMB": "Gambia", "GHA": "Ghana", "GIN": "Guinea", "GNB": "Guinea-Bissau",
    "KEN": "Kenya", "LSO": "Lesotho", "LBR": "Liberia", "LBY": "Libya",
    "MDG": "Madagascar", "MWI": "Malawi", "MLI": "Mali", "MRT": "Mauritania",
    "MUS": "Mauritius", "MAR": "Morocco", "MOZ": "Mozambique",
    "NAM": "Namibia", "NER": "Niger", "NGA": "Nigeria", "RWA": "Rwanda",
    "STP": "Sao Tome and Principe", "SEN": "Senegal", "SYC": "Seychelles",
    "SLE": "Sierra Leone", "SOM": "Somalia", "ZAF": "South Africa",
    "SSD": "South Sudan", "SDN": "Sudan", "TZA": "Tanzania", "TGO": "Togo",
    "TUN": "Tunisia", "UGA": "Uganda", "ZMB": "Zambia", "ZWE": "Zimbabwe",
    "ARG": "Argentina", "BHS": "Bahamas", "BRB": "Barbados", "BLZ": "Belize",
    "BOL": "Bolivia", "BRA": "Brazil", "CAN": "Canada", "CHL": "Chile",
    "COL": "Colombia", "CRI": "Costa Rica", "CUB": "Cuba", "DMA": "Dominica",
    "DOM": "Dominican Republic", "ECU": "Ecuador", "SLV": "El Salvador",
    "GRD": "Grenada", "GTM": "Guatemala", "GUY": "Guyana", "HTI": "Haiti",
    "HND": "Honduras", "JAM": "Jamaica", "MEX": "Mexico", "NIC": "Nicaragua",
    "PAN": "Panama", "PRY": "Paraguay", "PER": "Peru",
    "KNA": "Saint Kitts and Nevis", "LCA": "Saint Lucia",
    "VCT": "Saint Vincent and the Grenadines", "SUR": "Suriname",
    "TTO": "Trinidad and Tobago", "USA": "United States", "URY": "Uruguay",
    "VEN": "Venezuela",
    "AFG": "Afghanistan", "ARM": "Armenia", "AZE": "Azerbaijan",
    "BHR": "Bahrain", "BGD": "Bangladesh", "BTN": "Bhutan", "BRN": "Brunei",
    "KHM": "Cambodia", "CHN": "China", "CYP": "Cyprus", "GEO": "Georgia",
    "IND": "India", "IDN": "Indonesia", "IRN": "Iran", "IRQ": "Iraq",
    "ISR": "Israel", "JPN": "Japan", "JOR": "Jordan", "KAZ": "Kazakhstan",
    "KWT": "Kuwait", "KGZ": "Kyrgyzstan", "LAO": "Laos", "LBN": "Lebanon",
    "MYS": "Malaysia", "MDV": "Maldives", "MNG": "Mongolia", "MMR": "Myanmar",
    "NPL": "Nepal", "PRK": "North Korea", "OMN": "Oman", "PAK": "Pakistan",
    "PSE": "Palestine", "PHL": "Philippines", "QAT": "Qatar",
    "SAU": "Saudi Arabia", "SGP": "Singapore", "KOR": "South Korea",
    "LKA": "Sri Lanka", "SYR": "Syria", "TWN": "Taiwan", "TJK": "Tajikistan",
    "THA": "Thailand", "TLS": "Timor-Leste", "TUR": "Turkey",
    "TKM": "Turkmenistan", "ARE": "United Arab Emirates", "UZB": "Uzbekistan",
    "VNM": "Vietnam", "YEM": "Yemen",
    "ALB": "Albania", "AND": "Andorra", "AUT": "Austria", "BLR": "Belarus",
    "BEL": "Belgium", "BIH": "Bosnia and Herzegovina", "BGR": "Bulgaria",
    "HRV": "Croatia", "CZE": "Czech Republic", "DNK": "Denmark",
    "EST": "Estonia", "FIN": "Finland", "FRA": "France", "DEU": "Germany",
    "GRC": "Greece", "HUN": "Hungary", "ISL": "Iceland", "IRL": "Ireland",
    "ITA": "Italy", "XKX": "Kosovo", "LVA": "Latvia", "LIE": "Liechtenstein",
    "LTU": "Lithuania", "LUX": "Luxembourg", "MLT": "Malta", "MDA": "Moldova",
    "MCO": "Monaco", "MNE": "Montenegro", "NLD": "Netherlands",
    "MKD": "North Macedonia", "NOR": "Norway", "POL": "Poland",
    "PRT": "Portugal", "ROU": "Romania", "RUS": "Russia", "SMR": "San Marino",
    "SRB": "Serbia", "SVK": "Slovakia", "SVN": "Slovenia", "ESP": "Spain",
    "SWE": "Sweden", "CHE": "Switzerland", "UKR": "Ukraine",
    "GBR": "United Kingdom", "VAT": "Vatican City",
    "AUS": "Australia", "FJI": "Fiji", "KIR": "Kiribati",
    "MHL": "Marshall Islands", "FSM": "Micronesia", "NRU": "Nauru",
    "NZL": "New Zealand", "PLW": "Palau", "PNG": "Papua New Guinea",
    "WSM": "Samoa", "SLB": "Solomon Islands", "TON": "Tonga", "TUV": "Tuvalu",
    "VUT": "Vanuatu",
}

# ------------------------------------------------------- fake/specimen tables
# fake_document_detector.py:24-120
SPECIMEN_KEYWORDS = [
    "specimen", "sample", "void", "not valid", "invalid",
    "for display only", "display purposes", "example",
    "test document", "test card", "demo", "demonstration",
    "facsimile", "replica", "copy", "duplicate",
    "training", "practice", "mock", "fake",
    "not for identification", "no value", "cancelled",
    "spécimen", "échantillon", "annulé",
    "muestra", "anulado",
]

FAKE_NAME_PAIRS = [
    ("john", "doe"), ("jane", "doe"), ("john", "smith"), ("jane", "smith"),
    ("test", "user"), ("sample", "person"), ("example", "name"),
    ("first", "last"), ("firstname", "lastname"),
    ("any", "body"), ("some", "one"), ("no", "name"),
    ("john", "q"), ("john", "public"), ("joe", "bloggs"),
    ("richard", "roe"), ("baby", "doe"),
    ("james", "public"), ("jane", "public"),
    ("james", "quintin"), ("quintin", "public"),
    ("anita", "walker"), ("anita", "jean"), ("jean", "walker"),
    ("your", "name"), ("full", "name"), ("given", "name"),
    ("name", "here"), ("insert", "name"),
    ("jean", "dupont"), ("marie", "dupont"),
    ("pierre", "martin"), ("paul", "martin"),
    ("jan", "jansen"), ("max", "mustermann"),
    ("ivan", "ivanov"), ("juan", "garcia"),
]

FAKE_SINGLE_NAMES = [
    "specimen", "sample", "test", "demo", "void",
    "xxxxx", "nnnnn", "aaaaa", "zzzzz",
    "abcde", "qwerty", "asdfg",
    "public", "person", "citizen", "resident",
    "anybody", "someone", "noname", "anonymous",
]

FAKE_DOC_NUMBER_PATTERNS = [
    r"^0{5,}$",
    r"^1{5,}$",
    r"^9{5,}$",
    r"^X{3,}$",
    r"^[A-Z]0{5,}$",
    r"^(12345|123456|1234567|12345678|123456789)$",
    r"^(11111|22222|33333|44444|55555|66666|77777|88888|99999)$",
    r"^(AB123456|CD123456|XY123456)$",
    r"^(A1234567|B1234567|C1234567)$",
    r"^(AA000000|BB000000|XX000000)$",
    r"^SAMPLE\d*$",
    r"^TEST\d*$",
    r"^SPEC\d*$",
]

KNOWN_SPECIMEN_DOC_NUMBERS = [
    "AB123456", "CD123456", "XY123456",
    "A1234567", "B1234567", "L1234567",
    "123456789", "000000000", "999999999",
    "1234567890",
    "5584486674",
    "S1234567", "P1234567", "T1234567",
    "SPECIMEN", "SAMPLE", "TEST",
]

SUSPICIOUS_DATES = [
    "1900-01-01", "1970-01-01", "2000-01-01", "2020-01-01",
    "1111-11-11", "2222-02-22", "1234-12-34",
    "0001-01-01", "9999-12-31",
]

SUSPICIOUS_BIRTH_YEARS = [1900, 1901, 1911]

FAKE_ADDRESS_PATTERNS = [
    "123 main", "123 fake", "123 test", "123 sample",
    "456 main", "789 main", "100 main",
    "1234 main", "12345 main",
    "123 street", "123 avenue", "123 road",
    "fake street", "test street", "sample street",
    "anywhere", "somewhere", "nowhere", "anytown",
    "springfield",
    "123 sesame",
]

# ------------------------------------------------------------- date formats
# validators/base.py:61-76, Python strptime -> Spark SimpleDateFormat-ish
# patterns, SAME try order (the %d/%m/%Y-before-%m/%d/%Y ambiguity order is
# load-bearing, SURVEY.md §7.4.2).
DATE_FORMATS_SPARK = [
    "yyyy-MM-dd", "dd/MM/yyyy", "MM/dd/yyyy",
    "dd-MM-yyyy", "yyyy/MM/dd", "dd.MM.yyyy",
    "yyyy-MMM-dd", "yyyy-MMMM-dd",
    "dd-MMM-yyyy", "dd-MMMM-yyyy",
    "MMM-dd-yyyy", "MMMM-dd-yyyy",
    "MMMM dd, yyyy", "dd MMMM yyyy", "MMM dd, yyyy",
    "dd MMM yyyy", "MMM dd yyyy", "MMMM dd yyyy",
    "yyyyMMdd",
    "yyyy/MMM/dd", "dd/MMM/yyyy",
    "yyyy/MMMM/dd", "dd/MMMM/yyyy",
]
